#!/usr/bin/env python3
"""Generate tools/helmert14_expected.parquet — the pinned oracle artifact
for r_helmert14_datum (time-dependent 14-parameter Helmert, EPSG method
1053; the gen_helmert_expected.py pattern extended with epoch
propagation p(t) = p0 + rate * (t - refEpoch)).

Transformation under test: ITRF2014 -> GDA2020 (EPSG:8048, GDA2020
Technical Manual) — all seven parameters zero at epoch 2020.0, rotation
rates = the Australian plate motion (1.50379 / 1.18346 / 1.20716
mas/yr), position-vector convention. Each row carries its own
observation epoch (2015.0 + k/16 decimal years, dyadic-exact in f64).

Inputs reproduce the engine's counter RNG bit-exactly; keys cover
c_custkey 0..14999 (superset of every gate scale <= 0.1 — see
gate_sf.py's SF-ceiling note). Output columns:
  c_custkey BIGINT, epoch DOUBLE, lat_gda DOUBLE (8 dp),
  lon_gda DOUBLE (8 dp), h_gda DOUBLE (3 dp)

Run from /root/repo:  python3 tools/gen_helmert14_expected.py
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


GRS80 = (L("6378137.0"), L("298.257222101"))

# ITRF2014 -> GDA2020 (EPSG:8048): zero at 2020.0, rotation-rate only
SEC = np.pi / (L(180) * L(3600))
DRX = L("1.50379e-3") * SEC  # arc-sec/yr in radians
DRY = L("1.18346e-3") * SEC
DRZ = L("1.20716e-3") * SEC
REF_EPOCH = L("2020.0")


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


def helmert14(x, y, z, epoch):
    dt = L(epoch) - REF_EPOCH
    rx, ry, rz = DRX * dt, DRY * dt, DRZ * dt
    s = L(1)  # zero scale + zero scale rate
    return (s * (x - rz * y + ry * z),
            s * (rz * x + y - rx * z),
            s * (-ry * x + rx * y + z))


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
    keys, epochs, lats, lons, hs = [], [], [], [], []
    for key in key_set():
        # Australian plate band (the GDA2020 params' domain of validity)
        lat = -(u01(key, 71) * 34.0 + 10.0)   # 44..10 deg S
        lon = u01(key, 72) * 42.0 + 112.0     # 112..154 deg E
        h = u01(key, 73) * 1000.0
        # dyadic-exact epochs: 2015.0 + k/16, k in 0..159
        epoch = np.float64(np.floor(np.float64(u01(key, 74)) * 160.0) / 16.0
                           + 2015.0)
        x, y, z = to_geocentric(lat, lon, L(h), GRS80)
        x2, y2, z2 = helmert14(x, y, z, epoch)
        glat, glon, gh = to_geodetic(x2, y2, z2, GRS80)
        keys.append(key)
        epochs.append(epoch)
        lats.append(canon(glat, 8))
        lons.append(canon(glon, 8))
        hs.append(canon(gh, 3))
    table = pa.table({
        "c_custkey": pa.array(keys, pa.int64()),
        "epoch": pa.array(epochs, pa.float64()),
        "lat_gda": pa.array(lats, pa.float64()),
        "lon_gda": pa.array(lons, pa.float64()),
        "h_gda": pa.array(hs, pa.float64()),
    })
    pq.write_table(table, "tools/helmert14_expected.parquet", compression="zstd")
    print(f"wrote tools/helmert14_expected.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
