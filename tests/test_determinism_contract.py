"""Round-12 determinism contract (SCALE.md): no hashed output column
may depend on an ENGINE-evaluated transcendental. The r11 bisect
(heaps_moments_probe) proved libm ln diverges between DuckDB builds at
a micro-quantization boundary; the three families that carried that
risk were rewritten — these tests pin the contract so a regression
reintroducing engine trig/log into those oracles fails fast."""

from __future__ import annotations

import math
import re

from citibike_deep_dive_spark.plans import CATALOG
from citibike_deep_dive_spark.plans.round10 import (
    _TRIG_ROWS,
    _TWO_PI,
    _WAV_N_BASE,
    _WAV_N_MOD,
)
from citibike_deep_dive_spark.plans.round10d import _DCT_ROWS, _DCT_SIZES

_CONTRACT_QUERIES = [
    "heaps_law_loglog_fit",
    "heaps_moments_probe",
    "multimodal_wav_spectral_features",
    "multimodal_image_phash_buckets",
]

# an engine transcendental call: ln(, log(, log2(, cos(, sin(, exp(,
# pow( as a function token (log2 appears only in the heaps bucket,
# which is allowed because the ±1 shift correction makes the emitted
# bucket libm-independent — see heaps_anchor_frames)
_FORBIDDEN = re.compile(r"\b(ln|log|log10|cos|sin|tan|exp|pow)\s*\(", re.I)
_ALLOWED_HEAPS = re.compile(r"\blog2\s*\(", re.I)


def test_contract_oracles_contain_no_engine_transcendental():
    for name in _CONTRACT_QUERIES:
        sql = CATALOG[name].oracle
        assert sql is not None
        stripped = _ALLOWED_HEAPS.sub("F2(", sql) if name.startswith("heaps") else sql
        hits = _FORBIDDEN.findall(stripped)
        assert not hits, f"{name}: engine transcendental(s) {hits} on hashed surface"


def test_heaps_bucket_correction_bounds_any_libm_error():
    # the ±1 shift correction recovers the exact floor(log2) from ANY
    # libm estimate within ±1 of truth — exhaustively check the
    # correction formula over a wide integer range with adversarially
    # wrong k0 estimates
    for x in list(range(1, 4100)) + [2**40 - 1, 2**40, 2**40 + 1]:
        true_k = x.bit_length() - 1
        for k0 in (max(true_k - 1, 0), true_k, true_k + 1):
            if (1 << (k0 + 1)) <= x:
                k = k0 + 1
            elif (1 << k0) > x:
                k = k0 - 1
            else:
                k = k0
            assert k == true_k, (x, k0, k, true_k)


def _half_away_micro(x: float) -> int:
    return int(math.floor(x * 1e6 + 0.5)) if x >= 0 else -int(math.floor(-x * 1e6 + 0.5))


def test_spectral_trig_table_matches_independent_recompute():
    assert len(_TRIG_ROWS) == sum(
        range(_WAV_N_BASE, _WAV_N_BASE + _WAV_N_MOD)
    )
    for n, j, qc, qs in _TRIG_ROWS[:200] + _TRIG_ROWS[-200:]:
        assert 0 <= j < n
        assert qc == _half_away_micro(math.cos(_TWO_PI * j / n))
        assert qs == _half_away_micro(math.sin(_TWO_PI * j / n))
        assert -1_000_000 <= qc <= 1_000_000
        assert -1_000_000 <= qs <= 1_000_000


def test_dct_factor_table_matches_independent_recompute():
    assert len(_DCT_ROWS) == sum(s * s for s in range(1, _DCT_SIZES + 1))
    for s, c, f, q in _DCT_ROWS:
        assert 0 <= c < s and 0 <= f < s
        assert q == _half_away_micro(math.cos(math.pi * (2 * c + 1) * f / (2 * s)))
        # f = 0 is the DC row: cos(0) exactly
        if f == 0:
            assert q == 1_000_000


def test_literal_tables_are_embedded_in_oracle_sql():
    # the VALUES injection really reaches the oracle — spot-check one
    # interior tuple from each table
    n, j, qc, qs = _TRIG_ROWS[137]
    assert f"({n},{j},{qc},{qs})" in CATALOG["multimodal_wav_spectral_features"].oracle
    s, c, f, q = _DCT_ROWS[40]
    assert f"({s},{c},{f},{q})" in CATALOG["multimodal_image_phash_buckets"].oracle


# ---------------------------------------------------------------------------
# Ratchet: the quantize-then-integer-aggregate sub-class may not grow
# ---------------------------------------------------------------------------

# The heaps failure PROFILE is specifically: an engine libm value
# micro-quantized per term (round(f(x)*1e6) as integer) and then
# aggregated — one ulp flip in ONE term changes the integer sum
# exactly, where a value-grain 4-6 dp round absorbs it. These are the
# current members (r12 scan; SCALE.md "accepted-risk inventory"). The
# rotation re-verifies each within ~8 rounds; NEW members are banned —
# use the literal-table / raw-integer-emission patterns instead.
# r13 shrink (VERDICT r12 item 4): daily_volume_fourier now consumes a
# build-time literal phase-quantized trig table (round8g) and
# link_prediction_adamic_adar a literal 1/ln(deg) table over the
# structurally k-bounded degree range (round8i) — both removed below;
# tests further down pin their tables against independent recomputes.
_QUANTIZED_LIBM_MEMBERS = {
    "good_turing_bigram_smoothing",
    "kneser_ney_heldout_perplexity",
    "importance_weight_ess",
    "doremi_domain_reweight_step",
    "naive_bayes_lang_classifier",
    "rocchio_query_expansion",
    "min_k_prob_membership",
    "mmd_rbf_sources",
    "unigram_lm_viterbi_segments",
}

_QUANT_LIBM = re.compile(
    r"round\s*\([^()]*\b(?:ln|log2|log10|log|exp|pow|cos|sin|tan)\s*\(",
    re.I,
)


def test_no_new_quantized_libm_surfaces():
    found = set()
    for name, spec in CATALOG.items():
        if not spec.oracle:
            continue
        for m in _QUANT_LIBM.finditer(spec.oracle):
            frag = spec.oracle[m.start() : m.start() + 140]
            if "1000000" in frag or "100000" in frag:
                found.add(name)
                break
    new = found - _QUANTIZED_LIBM_MEMBERS
    assert not new, (
        f"new quantize-then-integer-aggregate libm surface(s) {sorted(new)}: "
        "use literal-table injection or raw-integer emission (SCALE.md r12)"
    )


# ---------------------------------------------------------------------------
# r13 cures: literal tables for the two members removed from the ratchet
# ---------------------------------------------------------------------------


def test_fourier_phase_table_matches_independent_recompute():
    from citibike_deep_dive_spark.plans.round8g import (
        _FOURIER_COS,
        _FOURIER_PHASE_BINS,
        _FOURIER_SIN,
    )

    assert len(_FOURIER_COS) == len(_FOURIER_SIN) == _FOURIER_PHASE_BINS
    for j in list(range(0, _FOURIER_PHASE_BINS, 97)) + [_FOURIER_PHASE_BINS - 1]:
        ang = 2.0 * math.pi * (j + 0.5) / _FOURIER_PHASE_BINS
        assert _FOURIER_COS[j] == _half_away_micro(math.cos(ang))
        assert _FOURIER_SIN[j] == _half_away_micro(math.sin(ang))
        assert -1_000_000 <= _FOURIER_COS[j] <= 1_000_000


def test_fourier_and_adamic_adar_oracles_libm_free():
    for name in ("daily_volume_fourier", "link_prediction_adamic_adar"):
        sql = CATALOG[name].oracle
        hits = _FORBIDDEN.findall(sql)
        assert not hits, f"{name}: engine transcendental(s) {hits}"


def test_adamic_adar_weight_table_matches_independent_recompute():
    from citibike_deep_dive_spark.plans.round8i import _AA_DEG_MAX, _AA_LNW

    assert set(_AA_LNW) == set(range(2, _AA_DEG_MAX + 1))
    for d, w in _AA_LNW.items():
        assert w == math.floor(1000000.0 / math.log(d) + 0.5)
    # the classic anchor: 1/ln(2) in micro-units
    assert _AA_LNW[2] == 1442695
