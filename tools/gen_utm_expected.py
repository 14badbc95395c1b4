#!/usr/bin/env python3
"""Generate tools/utm_expected.parquet — the pinned oracle artifact for
r_utm_project (judge round-5 #4).

DuckDB has no PROJ, and a 50-op transcendental chain recomputed in a
foreign engine cannot hash-match at the ulp level, so the oracle for the
UTM projection query is a STATIC TABLE produced once by this script with
an INDEPENDENT implementation:

  * inputs (lat, lon) are reproduced bit-exactly from the engine's
    counter RNG (pure integer mixing + exact power-of-two division —
    identical bits in Spark, DuckDB, and Python),
  * the Krueger/Karney 6th-order transverse-Mercator series (Karney 2011,
    eqs. 35) is evaluated in numpy longdouble (80-bit extended, ~18.9
    significant digits), so the stored easting/northing are the true
    series values to far below the engine's own ~1e-9 m accuracy,
  * the engine's canonical mm rounding (floor(x*1000 + 0.5)/1000, exact
    IEEE ops) is applied to the float64-rounded true value — the same
    rounding the Spark query applies to its own float64 result, so the
    two agree unless the engine's value drifts by more than its
    documented accuracy budget.

Keys cover c_custkey 0..14999 (superset of sf0.001/sf0.01/sf0.1), so one
artifact serves every gate scale. Output columns:
  c_custkey BIGINT, easting DOUBLE, northing DOUBLE

Run from /root/repo:  python3 tools/gen_utm_expected.py
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

M = 2147483648  # 2^31


def salt_c(salt):
    return (12345 + salt * 2654435761) % M


def mix(key, salt):
    """Exact integer twin of graft.rng.Rand.mixLong."""
    h1 = ((key % M) * 1103515245 + salt_c(salt)) % M
    h1x = h1 ^ (h1 // 8192)
    h2 = (h1x * 69069 + 362437) % M
    h2x = h2 ^ (h2 // 131072)
    h3 = (h2x * 48271 + 11) % M
    return h3 ^ (h3 // 32768)


def u01(key, salt):
    # mix() < 2^31 and the divisor is a power of two: the float64 result
    # is exact, hence bit-identical to Spark's and DuckDB's
    return float(mix(key, salt)) / 2147483648.0


L = np.longdouble
A_AXIS = L("6378137.0")
FLAT = L(1) / L("298.257223563")
K0 = L("0.9996")
E0 = L("500000.0")

n1 = FLAT / (L(2) - FLAT)
n2, n3 = n1 * n1, n1 * n1 * n1
n4, n5, n6 = n2 * n2, n2 * n3, n3 * n3
RECT_A = A_AXIS / (L(1) + n1) * (L(1) + n2 / 4 + n4 / 64 + n6 / 256)
ECC = np.sqrt(FLAT * (L(2) - FLAT))

ALPHA = [
    n1 / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288
    + 7891 * n6 / 37800,
    13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630
    - 1983433 * n6 / 1935360,
    61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880
    + 167603 * n6 / 181440,
    49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
    34729 * n5 / 80640 - 3418889 * n6 / 1995840,
    212378941 * n6 / 319334400,
]


def forward(lat_deg, lon_deg, lon0_deg):
    """Krueger forward in longdouble; returns (easting, northing)."""
    phi = L(lat_deg) * np.pi / L(180)
    dlam = L(lon_deg - lon0_deg) * np.pi / L(180)
    sin_phi = np.sin(phi)
    t = np.sinh(np.arctanh(sin_phi) - ECC * np.arctanh(ECC * sin_phi))
    cos_dlam = np.cos(dlam)
    xi_p = np.arctan2(t, cos_dlam)
    eta_p = np.arcsinh(np.sin(dlam) / np.sqrt(t * t + cos_dlam * cos_dlam))
    xi, eta = xi_p, eta_p
    for j in range(1, 7):
        xi = xi + ALPHA[j - 1] * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta = eta + ALPHA[j - 1] * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return E0 + K0 * RECT_A * eta, K0 * RECT_A * xi


def canon_round3(x128):
    """float64-round the true value, then apply the engine's canonical
    mm rounding chain in float64 (floor(x*1000 + 0.5)/1000)."""
    x = np.float64(x128)
    return np.float64(np.floor(x * np.float64(1000.0) + np.float64(0.5))
                      / np.float64(1000.0))




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
    keys, eastings, northings = [], [], []
    for key in key_set():
        lat = u01(key, 91) * 160.0 - 80.0
        lon = u01(key, 92) * 360.0 - 180.0
        zone = min(60, max(1, int(np.floor((lon + 180.0) / 6.0)) + 1))
        lon0 = (zone - 1) * 6.0 - 180.0 + 3.0
        e, nn = forward(lat, lon, lon0)
        keys.append(key)
        eastings.append(canon_round3(e))
        northings.append(canon_round3(nn))
    table = pa.table({
        "c_custkey": pa.array(keys, pa.int64()),
        "easting": pa.array(eastings, pa.float64()),
        "northing": pa.array(northings, pa.float64()),
    })
    pq.write_table(table, "tools/utm_expected.parquet", compression="zstd")
    print(f"wrote tools/utm_expected.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
