"""Independent cross-check of the TR 38.901 CDL table transcription.

VERDICT r2 weak #6: `chanstats` validates the generator against analytic
covariances built from the SAME `CDL_PROFILES` rows it consumes, so a
transcription typo would sail through. This file holds a SECOND,
independently entered transcription of 3GPP TR 38.901 Tables 7.7.1-1..5
(typed in a separate session without reference to data/cdl.py) plus
published scalar invariants of the tables themselves:

  - cluster counts (23 / 23 / 24 / 13+LOS / 14+LOS),
  - unit RMS delay spread of the normalized delay column (TR 38.901
    §7.7.3: CDL delays are "normalized delays" scaled to DS_desired, so
    the tabulated column has power-weighted RMS spread 1),
  - strongest NLoS cluster at 0 dB (per-table power normalization),
  - LOS-cluster K offsets: P1,LOS − P1,Laplacian = 13.3 dB (CDL-D) and
    22.0 dB (CDL-E) — the tables' published K_1 values,
  - per-cluster spreads c_ASD/c_ASA/c_ZSD/c_ZSA and XPR per profile.

A single-digit typo in any delay, power, angle, spread, or XPR entry of
data/cdl.py fails the exact-equality check below.
"""

import numpy as np

from score_based_channels_tpu.data.cdl import (
    CDL_PROFILES, RAY_OFFSETS, RAY_OFFSETS_PM,
)

# ---------------------------------------------------------------------------
# independent transcription (TR 38.901 v16, Tables 7.7.1-1 … 7.7.1-5)
# columns: normalized delay, power [dB], AoD, AoA, ZoD, ZoA [deg]
# ---------------------------------------------------------------------------

CDL_A_INDEP = [
    [0.0000, -13.4, -178.1, 51.3, 50.2, 125.4],
    [0.3819, 0.0, -4.2, -152.7, 93.2, 91.3],
    [0.4025, -2.2, -4.2, -152.7, 93.2, 91.3],
    [0.5868, -4.0, -4.2, -152.7, 93.2, 91.3],
    [0.4610, -6.0, 90.2, 76.6, 122.0, 94.0],
    [0.5375, -8.2, 90.2, 76.6, 122.0, 94.0],
    [0.6708, -9.9, 90.2, 76.6, 122.0, 94.0],
    [0.5750, -10.5, 121.5, -1.8, 150.2, 47.1],
    [0.7618, -7.5, -81.7, -41.9, 55.2, 56.0],
    [1.5375, -15.9, 158.4, 94.2, 26.4, 30.1],
    [1.8978, -6.6, -83.0, 51.9, 126.4, 58.8],
    [2.2242, -16.7, 134.8, -115.9, 171.6, 26.0],
    [2.1718, -12.4, -153.0, 26.6, 151.4, 49.2],
    [2.4942, -15.2, -172.0, 76.6, 157.2, 143.1],
    [2.5119, -10.8, -129.9, -7.0, 47.2, 117.4],
    [3.0582, -11.3, -136.0, -23.0, 40.4, 122.7],
    [4.0810, -12.7, 165.4, -47.2, 43.3, 123.2],
    [4.4579, -16.2, 148.4, 110.4, 161.8, 32.6],
    [4.5695, -18.3, 132.7, 144.5, 10.8, 27.2],
    [4.7966, -18.9, -118.6, 155.3, 16.7, 15.2],
    [5.0066, -16.6, -154.1, 102.0, 171.7, 146.0],
    [5.3043, -19.9, 126.5, -151.8, 22.7, 150.7],
    [9.6586, -29.7, -56.2, 55.2, 144.9, 156.1],
]

CDL_B_INDEP = [
    [0.0000, 0.0, 9.3, -173.3, 105.8, 78.9],
    [0.1072, -2.2, 9.3, -173.3, 105.8, 78.9],
    [0.2155, -4.0, 9.3, -173.3, 105.8, 78.9],
    [0.2095, -3.2, -34.1, 125.5, 115.3, 63.3],
    [0.2870, -9.8, -65.4, -88.0, 119.3, 59.9],
    [0.2986, -1.2, -11.4, 155.1, 103.2, 67.5],
    [0.3752, -3.4, -11.4, 155.1, 103.2, 67.5],
    [0.5055, -5.2, -11.4, 155.1, 103.2, 67.5],
    [0.3681, -7.6, -67.2, -89.8, 118.2, 82.6],
    [0.3697, -3.0, 52.5, 132.1, 102.0, 66.3],
    [0.5700, -8.9, -72.0, -83.6, 100.4, 61.6],
    [0.5283, -9.0, 74.3, 95.3, 98.3, 58.0],
    [1.1021, -4.8, -52.2, 103.7, 103.4, 78.2],
    [1.2756, -5.7, -50.5, -87.8, 102.5, 82.0],
    [1.5474, -7.5, 61.4, -92.5, 101.4, 62.4],
    [1.7842, -1.9, 30.6, -139.1, 103.0, 78.0],
    [2.0169, -7.6, -72.5, -90.6, 100.0, 60.9],
    [2.8294, -12.2, -90.6, 58.6, 115.2, 82.9],
    [3.0219, -9.8, -77.6, -79.0, 100.5, 60.8],
    [3.6187, -11.4, -82.6, 65.8, 119.6, 57.3],
    [4.1067, -14.9, -103.6, 52.7, 118.7, 59.9],
    [4.2790, -9.2, 75.6, 88.7, 117.8, 60.1],
    [4.7834, -11.3, -77.6, -60.4, 115.7, 62.3],
]

CDL_C_INDEP = [
    [0.0000, -4.4, -46.6, -101.0, 97.2, 87.6],
    [0.2099, -1.2, -22.8, 120.0, 98.6, 72.1],
    [0.2219, -3.5, -22.8, 120.0, 98.6, 72.1],
    [0.2329, -5.2, -22.8, 120.0, 98.6, 72.1],
    [0.2176, -2.5, -40.7, -127.5, 100.6, 70.1],
    [0.6366, 0.0, 0.3, 170.4, 99.2, 75.3],
    [0.6448, -2.2, 0.3, 170.4, 99.2, 75.3],
    [0.6560, -3.9, 0.3, 170.4, 99.2, 75.3],
    [0.6584, -7.4, 73.1, 55.4, 105.2, 67.4],
    [0.7935, -7.1, -64.5, 66.5, 95.3, 63.8],
    [0.8213, -10.7, 80.2, -48.1, 106.1, 71.4],
    [0.9336, -11.1, -97.1, 46.9, 93.5, 60.5],
    [1.2285, -5.1, -55.3, 68.1, 103.7, 90.6],
    [1.3083, -6.8, -64.3, -68.7, 104.2, 60.1],
    [2.1704, -8.7, -78.5, 81.5, 93.0, 61.0],
    [2.7105, -13.2, 102.7, 30.7, 104.2, 100.7],
    [4.2589, -13.9, 99.2, -16.4, 94.9, 62.3],
    [4.6003, -13.9, 88.8, 3.8, 93.1, 66.7],
    [5.4902, -15.8, -101.9, -13.7, 92.2, 52.9],
    [5.6077, -17.1, 92.2, 9.7, 106.7, 61.8],
    [6.3065, -16.0, 93.3, 5.6, 93.0, 51.9],
    [6.6374, -15.7, 106.6, 0.7, 92.9, 61.7],
    [7.0427, -21.6, 119.5, -21.9, 105.2, 58.0],
    [8.6523, -22.8, -123.8, 33.6, 107.8, 57.0],
]

CDL_D_INDEP = [
    [0.0000, -0.2, 0.0, -180.0, 98.5, 81.5],    # cluster 1, LOS specular
    [0.0000, -13.5, 0.0, -180.0, 98.5, 81.5],   # cluster 1, Laplacian
    [0.035, -18.8, 89.2, 89.2, 85.5, 86.9],
    [0.612, -21.0, 89.2, 89.2, 85.5, 86.9],
    [1.363, -22.8, 89.2, 89.2, 85.5, 86.9],
    [1.405, -17.9, 13.0, 163.0, 97.5, 79.4],
    [1.804, -20.1, 13.0, 163.0, 97.5, 79.4],
    [2.596, -21.9, 13.0, 163.0, 97.5, 79.4],
    [1.775, -22.9, 34.6, -137.0, 98.5, 78.3],
    [4.042, -27.8, -64.5, 74.5, 88.4, 73.6],
    [7.937, -23.6, -32.9, 127.7, 91.3, 78.9],
    [9.424, -24.8, 52.6, -119.6, 103.8, 87.8],
    [9.708, -30.0, -132.1, -9.1, 80.3, 70.8],
    [12.525, -27.7, 77.2, -83.8, 86.5, 72.8],
]

CDL_E_INDEP = [
    [0.0000, -0.03, 0.0, -180.0, 99.6, 80.4],    # cluster 1, LOS specular
    [0.0000, -22.03, 0.0, -180.0, 99.6, 80.4],   # cluster 1, Laplacian
    [0.5133, -15.8, 57.5, 18.2, 104.2, 80.4],
    [0.5440, -18.1, 57.5, 18.2, 104.2, 80.4],
    [0.5630, -19.8, 57.5, 18.2, 104.2, 80.4],
    [0.5440, -22.9, -20.1, 101.8, 99.4, 80.8],
    [0.7112, -22.4, 16.2, 112.9, 100.8, 86.3],
    [1.9092, -18.6, 9.3, -155.5, 98.8, 82.7],
    [1.9293, -20.8, 9.3, -155.5, 98.8, 82.7],
    [1.9589, -22.6, 9.3, -155.5, 98.8, 82.7],
    [2.6426, -22.3, 19.0, -143.3, 100.8, 82.9],
    [3.7136, -25.6, 32.7, -94.7, 96.4, 88.0],
    [5.4524, -20.2, 0.5, 147.0, 98.9, 81.0],
    [12.0034, -29.8, 55.9, -36.2, 95.6, 88.6],
    [20.6419, -29.2, 57.6, -26.0, 104.6, 78.3],
]

# (c_ASD, c_ASA, c_ZSD, c_ZSA, XPR dB) per Tables 7.7.1-1..5
SPREADS_INDEP = {
    "CDL-A": (5.0, 11.0, 3.0, 3.0, 10.0),
    "CDL-B": (10.0, 22.0, 3.0, 7.0, 8.0),
    "CDL-C": (2.0, 15.0, 3.0, 7.0, 7.0),
    "CDL-D": (5.0, 8.0, 3.0, 3.0, 11.0),
    "CDL-E": (5.0, 11.0, 3.0, 7.0, 8.0),
}

# TR 38.901 Table 7.5-3: ray offset angles within a cluster (unit spread)
RAY_OFFSETS_INDEP = [0.0447, 0.1413, 0.2492, 0.3715, 0.5129,
                     0.6797, 0.8844, 1.1481, 1.5195, 2.1551]

_TABLES = {
    "CDL-A": CDL_A_INDEP, "CDL-B": CDL_B_INDEP, "CDL-C": CDL_C_INDEP,
    "CDL-D": CDL_D_INDEP, "CDL-E": CDL_E_INDEP,
}


def test_tables_match_independent_transcription_exactly():
    for name, indep in _TABLES.items():
        np.testing.assert_array_equal(
            CDL_PROFILES[name].rows, np.asarray(indep, np.float64),
            err_msg=f"{name} rows differ from the independent transcription")


def test_spreads_and_xpr_match_independent_transcription():
    for name, (asd, asa, zsd, zsa, xpr) in SPREADS_INDEP.items():
        p = CDL_PROFILES[name]
        assert (p.c_asd, p.c_asa, p.c_zsd, p.c_zsa, p.xpr_db) == \
            (asd, asa, zsd, zsa, xpr), name


def test_ray_offsets_match_independent_transcription():
    np.testing.assert_array_equal(RAY_OFFSETS,
                                  np.asarray(RAY_OFFSETS_INDEP, np.float64))
    assert RAY_OFFSETS_PM.shape == (20,)
    np.testing.assert_array_equal(RAY_OFFSETS_PM[:10], RAY_OFFSETS)
    np.testing.assert_array_equal(RAY_OFFSETS_PM[10:], -RAY_OFFSETS)


def test_cluster_counts_and_los_flags():
    expect = {"CDL-A": (23, False), "CDL-B": (23, False),
              "CDL-C": (24, False), "CDL-D": (14, True), "CDL-E": (15, True)}
    for name, (n_rows, los) in expect.items():
        p = CDL_PROFILES[name]
        assert p.rows.shape == (n_rows, 6), name
        assert p.los == los, name


def test_unit_rms_delay_spread():
    """The normalized-delay column has power-weighted RMS spread 1
    (TR 38.901 §7.7.3 scaling convention) — catches delay OR power typos."""
    for name, p in CDL_PROFILES.items():
        r = p.rows
        w = 10.0 ** (r[:, 1] / 10.0)
        w = w / w.sum()
        mu = (w * r[:, 0]).sum()
        rms = np.sqrt((w * r[:, 0] ** 2).sum() - mu ** 2)
        assert abs(rms - 1.0) < 0.02, (name, rms)


def test_nlos_normalization_and_los_k_offsets():
    # strongest non-specular cluster sits at 0 dB in the NLoS tables
    for name in ("CDL-A", "CDL-B", "CDL-C"):
        assert CDL_PROFILES[name].rows[:, 1].max() == 0.0, name
    # published K_1 = P(1,LOS) - P(1,Laplacian): 13.3 dB (D), 22.0 dB (E)
    d = CDL_PROFILES["CDL-D"].rows
    e = CDL_PROFILES["CDL-E"].rows
    assert abs((d[0, 1] - d[1, 1]) - 13.3) < 1e-9
    assert abs((e[0, 1] - e[1, 1]) - 22.0) < 1e-9
    # both halves of the split cluster share delay and angles
    np.testing.assert_array_equal(d[0, [0, 2, 3, 4, 5]], d[1, [0, 2, 3, 4, 5]])
    np.testing.assert_array_equal(e[0, [0, 2, 3, 4, 5]], e[1, [0, 2, 3, 4, 5]])
