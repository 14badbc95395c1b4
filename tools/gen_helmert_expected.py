#!/usr/bin/env python3
"""Generate tools/helmert_expected.parquet — the pinned oracle artifact
for r_helmert_datum (the UTM-gate pattern, gen_utm_expected.py).

Same rationale: a trig chain recomputed in a foreign engine cannot
hash-match at the ulp level, so the expected OSGB36→WGS84 geodetic
outputs are produced once here with an INDEPENDENT numpy-longdouble
evaluation of the same public formulae (geodetic→geocentric, EPSG-1033
position-vector Helmert, Bowring-1976 inverse), float64-cast and then
canonically rounded exactly as the engine rounds its own float64 result
(floor(x·10^d + 0.5)/10^d).

Inputs reproduce the engine's counter RNG bit-exactly; keys cover
c_custkey 0..14999 (superset of every gate scale). Output columns:
  c_custkey BIGINT, lat_wgs DOUBLE (8 dp), lon_wgs DOUBLE (8 dp),
  h_wgs DOUBLE (3 dp)

Run from /root/repo:  python3 tools/gen_helmert_expected.py
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

M = 2147483648  # 2^31
L = np.longdouble


def salt_c(salt):
    return (12345 + salt * 2654435761) % M


def mix(key, salt):
    h1 = ((key % M) * 1103515245 + salt_c(salt)) % M
    h1x = h1 ^ (h1 // 8192)
    h2 = (h1x * 69069 + 362437) % M
    h2x = h2 ^ (h2 // 131072)
    h3 = (h2x * 48271 + 11) % M
    return h3 ^ (h3 // 32768)


def u01(key, salt):
    return float(mix(key, salt)) / 2147483648.0


# ellipsoids (a, 1/f)
AIRY = (L("6377563.396"), L("299.3249646"))
WGS84 = (L("6378137.0"), L("298.257223563"))

# OSGB36 -> WGS84 position-vector parameters (OS guidance note 7)
TX, TY, TZ = L("446.448"), L("-125.157"), L("542.060")
SEC = np.pi / (L(180) * L(3600))
RX, RY, RZ = L("0.1502") * SEC, L("0.2470") * SEC, L("0.8421") * SEC
S = L(1) + L("-20.4894") * L("1e-6")


def to_geocentric(lat_deg, lon_deg, h, ell):
    a, inv_f = ell
    f = L(1) / inv_f
    e2 = f * (L(2) - f)
    phi = L(lat_deg) * np.pi / L(180)
    lam = L(lon_deg) * np.pi / L(180)
    sp, cp = np.sin(phi), np.cos(phi)
    nu = a / np.sqrt(L(1) - e2 * sp * sp)
    return ((nu + h) * cp * np.cos(lam),
            (nu + h) * cp * np.sin(lam),
            (nu * (L(1) - e2) + h) * sp)


def helmert(x, y, z):
    return (TX + S * (x - RZ * y + RY * z),
            TY + S * (RZ * x + y - RX * z),
            TZ + S * (-RY * x + RX * y + z))


def to_geodetic(x, y, z, ell):
    a, inv_f = ell
    f = L(1) / inv_f
    e2 = f * (L(2) - f)
    b = a * (L(1) - f)
    ep2 = e2 / (L(1) - e2)
    p = np.sqrt(x * x + y * y)
    theta = np.arctan2(z * a, p * b)
    st, ct = np.sin(theta), np.cos(theta)
    phi = np.arctan2(z + ep2 * b * st ** 3, p - e2 * a * ct ** 3)
    sp = np.sin(phi)
    nu = a / np.sqrt(L(1) - e2 * sp * sp)
    return (phi * L(180) / np.pi,
            np.arctan2(y, x) * L(180) / np.pi,
            p / np.cos(phi) - nu)


def canon(x128, d):
    x = np.float64(x128)
    p = np.float64(10.0 ** d)
    return np.float64(np.floor(x * p + np.float64(0.5)) / p)




def key_set():
    """Keys to pin: 0..14999 (every driver gate scale) plus, when a
    parquet table/glob is passed as argv[1], that table's DISTINCT
    c_custkey values — lets one artifact also serve ScaleGen fixtures
    (sf1's replica-offset keys reach ~9M)."""
    import sys, os
    keys = set(range(15000))
    if len(sys.argv) > 1:
        import duckdb
        pat = sys.argv[1]
        if os.path.isdir(pat):
            pat = pat + "/*.parquet"
        con = duckdb.connect()
        keys |= {r[0] for r in con.execute(
            "SELECT DISTINCT c_custkey FROM read_parquet(?)",
            [pat]).fetchall()}
    return sorted(keys)

def main():
    keys, lats, lons, hs = [], [], [], []
    for key in key_set():
        # GB-ish lat/lon band (the OSGB36 params' domain of validity)
        lat = u01(key, 61) * 10.0 + 50.0     # 50..60 deg N
        lon = u01(key, 62) * 10.0 - 8.0      # -8..2 deg E
        h = u01(key, 63) * 1000.0            # 0..1000 m
        x, y, z = to_geocentric(lat, lon, L(h), AIRY)
        x2, y2, z2 = helmert(x, y, z)
        glat, glon, gh = to_geodetic(x2, y2, z2, WGS84)
        keys.append(key)
        lats.append(canon(glat, 8))
        lons.append(canon(glon, 8))
        hs.append(canon(gh, 3))
    table = pa.table({
        "c_custkey": pa.array(keys, pa.int64()),
        "lat_wgs": pa.array(lats, pa.float64()),
        "lon_wgs": pa.array(lons, pa.float64()),
        "h_wgs": pa.array(hs, pa.float64()),
    })
    pq.write_table(table, "tools/helmert_expected.parquet", compression="zstd")
    print(f"wrote tools/helmert_expected.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
