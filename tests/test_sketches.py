from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_CORRECT


def test_approx_quantiles_close_to_exact(spark):
    exact = {
        r.event_type: (r.p50, r.p99)
        for r in entrymod.q42_value_percentiles(spark, SF_CORRECT).collect()
    }
    approx = {
        r.event_type: (r.p50_approx, r.p99_approx)
        for r in entrymod.q49_approx_quantiles(spark, SF_CORRECT).collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        assert abs(approx[k][0] - exact[k][0]) < 1.0, k  # values span ~0-100
        assert abs(approx[k][1] - exact[k][1]) < 2.0, k


def test_hll_within_rsd_of_exact(spark):
    exact = {
        r.event_type: r.n_users
        for r in entrymod.q40_distinct_users(spark, SF_CORRECT).collect()
    }
    approx = {
        r.event_type: r.n_users_approx
        for r in entrymod.q41_hll_users(spark, SF_CORRECT).collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        rel = abs(approx[k] - exact[k]) / max(exact[k], 1)
        assert rel < 0.10, f"{k}: hll {approx[k]} vs exact {exact[k]} ({rel:.2%})"