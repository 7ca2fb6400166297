package graft.metar

/** Captured-shape CheckWX fixture documents (`/root/repo/FIXTURES.md`
  * §A1), shared verbatim between the Spark queries and the DuckDB
  * oracle (inlined as SQL VALUES) so both engines normalize identical
  * input. Variants cover every tolerance behavior cited in SURVEY §1.3:
  * full document, `raw` fallback, missing sub-objects, short
  * coordinates, near-empty document.
  */
object MetarFixture {

  val docs: Seq[String] = Seq(
    // full document
    """{"icao":"UUEE","observed":"2025-12-12T06:30:00Z","raw_text":"UUEE 120630Z 25007MPS 9999 OVC020 M03/M06 Q1012 NOSIG","flight_category":"VFR","temperature":{"celsius":-3.0,"fahrenheit":26.6},"dewpoint":{"celsius":-6.0,"fahrenheit":21.2},"wind":{"degrees":250,"speed_kts":14,"speed_mps":7,"speed_kph":26,"speed_mph":16,"gust_kts":null},"visibility":{"meters":9999,"meters_text":"10+","miles":6.2,"miles_text":"6+"},"barometer":{"hg":29.88,"hpa":1012,"kpa":101.2,"mb":1012},"ceiling":{"feet":2000,"meters":609.6},"humidity":{"percent":80},"elevation":{"feet":623,"meters":190},"station":{"name":"Sheremetyevo International Airport","location":"Moscow, Russia","type":"Airport","geometry":{"type":"Point","coordinates":[37.414589,55.972642]}},"clouds":[{"code":"OVC","text":"Overcast","feet":2000,"meters":609.6}],"conditions":[]}""",
    // `raw` instead of `raw_text` (schema-drift fallback, main.py:115)
    """{"icao":"UUDD","observed":"2025-12-12T06:35:00Z","raw":"UUDD 120635Z 18004MPS CAVOK M05/M08 Q1013 NOSIG","flight_category":"VFR","temperature":{"celsius":-5.0,"fahrenheit":23.0},"wind":{"degrees":180,"speed_kts":8},"visibility":{"meters":10000},"barometer":{"hpa":1013},"humidity":{"percent":75},"station":{"name":"Domodedovo International Airport","location":"Moscow, Russia","type":"Airport","geometry":{"type":"Point","coordinates":[37.906111,55.408611]}},"clouds":[]}""",
    // short coordinates array (length guard, main.py:104-109)
    """{"icao":"UUWW","observed":"2025-12-12T06:40:00Z","raw_text":"UUWW 120640Z 21006MPS 9000 -SN OVC012 M04/M06 Q1011","flight_category":"MVFR","temperature":{"celsius":-4.0},"dewpoint":{"celsius":-6.5},"wind":{"degrees":210,"speed_kts":12,"gust_kts":18},"visibility":{"meters":9000},"barometer":{"hpa":1011},"humidity":{"percent":83},"station":{"name":"Vnukovo International Airport","geometry":{"type":"Point","coordinates":[37.261486]}},"clouds":[{"code":"OVC","text":"Overcast","feet":1200,"meters":365.8},{"code":"SN","text":"Snow","feet":null,"meters":null}],"conditions":[{"code":"-SN","text":"Light Snow"}]}""",
    // missing sub-objects entirely (or-{} defaults, main.py:92-100)
    """{"icao":"ULLI","observed":"2025-12-12T06:30:00Z","raw_text":"ULLI 120630Z 00000MPS 0300 FZFG VV001 M07/M08 Q1015"}""",
    // second observation for an airport, later time (dedup-to-latest input)
    """{"icao":"UUEE","observed":"2025-12-12T07:00:00Z","raw_text":"UUEE 120700Z 24006MPS 9999 OVC018 M03/M05 Q1012 NOSIG","flight_category":"VFR","temperature":{"celsius":-2.5,"fahrenheit":27.5},"dewpoint":{"celsius":-5.0},"wind":{"degrees":240,"speed_kts":12},"visibility":{"meters":9999},"barometer":{"hpa":1012},"humidity":{"percent":82},"station":{"name":"Sheremetyevo International Airport","location":"Moscow, Russia","type":"Airport","geometry":{"type":"Point","coordinates":[37.414589,55.972642]}},"clouds":[{"code":"OVC","text":"Overcast","feet":1800,"meters":548.6}]}""")

  /** The fixture as a SQL VALUES list (single-quote escaped). */
  def valuesSql: String =
    docs.map(d => "('" + d.replace("'", "''") + "')").mkString("(VALUES ", ", ", ")")
}
