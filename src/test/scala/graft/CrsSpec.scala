package graft

import graft.geo.Crs

class CrsSpec extends SparkSuite {
  test("geoid key normalization and lookup") {
    assert(Crs.lookupGeoid("GEOID 12B").contains("us_noaa_g2012ba0.tif"))
    assert(Crs.lookupGeoid("EGM2008").contains("us_nga_egm08_25.tif"))
    assert(Crs.lookupGeoid("unknown-datum").isEmpty)
  }
  test("compound CRS naming with epoch") {
    assert(Crs.compoundCrs("32611", Some("5703"), Some(2018.45)) ==
      "EPSG:32611+5703 @2018.450")
    assert(Crs.compoundCrs("4326", None, None) == "EPSG:4326")
  }
  test("UTM zone from centroid") {
    assert(Crs.utmEpsgFor(-117.0, 36.0) == "32611")
    assert(Crs.utmEpsgFor(-117.0, -36.0) == "32711")
    assert(Crs.utmEpsgFor(179.9, 10.0) == "32660")
  }
}
