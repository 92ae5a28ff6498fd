"""Round-12 batch: the fixed-point radix-2 FFT spectral query
(plans/round12.py) — exact Python-reference parity, float-FFT accuracy,
Parseval energy check, and the int64 magnitude bound."""

from __future__ import annotations

import numpy as np

from citibike_deep_dive_spark.plans import CATALOG
from citibike_deep_dive_spark.plans.round12 import (
    _FFT_N,
    _FFT_SCALE_BITS,
    _FFT_TWIDDLES,
    fft_fixed_point,
)

SF_DIR = "/root/testdata/sf0.001"


def _samples(mid: int) -> list[int]:
    return [
        ((mid % 99991) * 6007 + idx * 193 + 11) % 65536 - 32768
        for idx in range(_FFT_N)
    ]


def _py_features(mid: int):
    x = fft_fixed_point(_samples(mid))
    pows = {k: x[k][0] ** 2 + x[k][1] ** 2 for k in range(1, _FFT_N // 2 + 1)}
    maxp = max(pows.values())
    return {
        "n_bins": _FFT_N // 2,
        "dominant_bin": min(k for k, p in pows.items() if p == maxp),
        "dominant_power": maxp,
        "low_band_power": sum(p for k, p in pows.items() if k <= _FFT_N // 8),
        "total_power": sum(pows.values()),
    }


def test_fft_spark_matches_exact_python_reference(spark):
    rows = {
        r["media_id"]: r
        for r in CATALOG["multimodal_fft_spectral_power"].build(spark, SF_DIR).collect()
    }
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == n_docs
    for mid in sorted(rows)[:10]:
        want = _py_features(mid)
        got = rows[mid]
        for key, val in want.items():
            assert got[key] == val, (mid, key, got[key], val)


def test_fixed_point_fft_tracks_float_fft():
    # the fixed-point spectrum must agree with numpy's float FFT to the
    # quantization tolerance, and satisfy Parseval's energy identity
    for mid in (0, 3, 17, 123, 4567):
        s = np.array(_samples(mid), dtype=np.float64)
        fx = fft_fixed_point([int(v) for v in s])
        got = np.array([complex(r, i) for r, i in fx])
        ref = np.fft.fft(s)
        rel = np.abs(got - ref) / (np.abs(ref) + 1.0)
        assert float(rel.max()) < 2e-3
        energy = float((s**2).sum())
        parseval = float((np.abs(got) ** 2).sum()) / _FFT_N
        assert abs(parseval - energy) / energy < 1e-4


def test_fft_magnitude_never_leaves_int64_bounds():
    # module docstring bound: |re|,|im| <= 32768 * 2.42^6 ~ 6.6e6, so
    # products and powers stay far inside int64. Exercise the honest
    # worst case available: the max-amplitude square wave at the
    # half-band frequency concentrates all energy into one bin.
    worst = [32767 if i % 2 == 0 else -32768 for i in range(_FFT_N)]
    x = fft_fixed_point(worst)
    m = max(max(abs(r), abs(i)) for r, i in x)
    assert m <= 32768 * 2.42**6
    assert all(
        abs(r * r + i * i) < (1 << 62) for r, i in x
    )  # powers never overflow


def test_twiddle_tables_are_normalized_fixed_point():
    one = 1 << _FFT_SCALE_BITS
    for twc, tws in _FFT_TWIDDLES:
        assert twc[0] == one and tws[0] == 0  # W^0 = 1 exactly
        for c, s in zip(twc, tws):
            assert abs(c) <= one and abs(s) <= one
            # |W| = 1 to quantization error
            assert abs((c * c + s * s) - one * one) <= 3 * one


def test_fft_plan_is_exchange_free(spark):
    plan = (
        CATALOG["multimodal_fft_spectral_power"]
        .build(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan[:2000]


# ---------------------------------------------------------------------------
# multimodal_stft_spectrogram
# ---------------------------------------------------------------------------


def test_stft_spark_matches_exact_python_reference(spark):
    from citibike_deep_dive_spark.plans.round12 import (
        _STFT_CLIP,
        _STFT_FRAMES,
        stft_fixed_point,
    )

    rows = {}
    for r in (
        CATALOG["multimodal_stft_spectrogram"].build(spark, SF_DIR).collect()
    ):
        rows[(r["media_id"], r["frame"])] = r
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == n_docs * _STFT_FRAMES
    for mid in (0, 1, 7, 42):
        samples = [
            ((mid % 99991) * 6007 + idx * 193 + 11) % 65536 - 32768
            for idx in range(_STFT_CLIP)
        ]
        spectra = stft_fixed_point(samples)
        for f, x in enumerate(spectra):
            pows = {
                k: x[k][0] ** 2 + x[k][1] ** 2 for k in range(1, _FFT_N // 2 + 1)
            }
            maxp = max(pows.values())
            got = rows[(mid, f)]
            assert got["dominant_bin"] == min(
                k for k, p in pows.items() if p == maxp
            )
            assert got["dominant_power"] == maxp
            assert got["total_power"] == sum(pows.values())


def test_stft_hann_window_is_symmetric_normalized_fixed_point():
    from citibike_deep_dive_spark.plans.round12 import _STFT_HANN

    one = 1 << _FFT_SCALE_BITS
    assert _STFT_HANN[0] == 0  # Hann endpoints are exactly zero
    assert max(_STFT_HANN) <= one
    for i in range(_FFT_N):
        assert _STFT_HANN[i] == _STFT_HANN[_FFT_N - 1 - i]  # symmetry


def test_stft_plan_has_no_aggregation_exchange(spark):
    plan = (
        CATALOG["multimodal_stft_spectrogram"]
        .build(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan[:2000]


def test_batch_fft_matches_scalar_reference():
    # r13: the butterflies moved from Catalyst HOF projections into a
    # vectorized numpy implementation inside the decode's Arrow boundary
    # (guide §4.2). The batch form must reproduce the scalar reference
    # bit for bit — including negative inputs, whose >> must floor.
    import numpy as np

    from citibike_deep_dive_spark.plans.round12 import (
        fft_fixed_point_batch,
        fft_power_bins,
    )

    rng = np.random.RandomState(12345)
    batch = rng.randint(-32768, 32768, size=(64, _FFT_N)).astype(np.int64)
    batch[0] = [32767 if i % 2 == 0 else -32768 for i in range(_FFT_N)]
    re, im = fft_fixed_point_batch(batch)
    pows = fft_power_bins(batch)
    for r in range(batch.shape[0]):
        ref = fft_fixed_point([int(v) for v in batch[r]])
        for i in range(_FFT_N):
            assert (int(re[r][i]), int(im[r][i])) == ref[i], (r, i)
        for k in range(1, _FFT_N // 2 + 1):
            want = ref[k][0] ** 2 + ref[k][1] ** 2
            assert int(pows[r][k - 1]) == want, (r, k)
