"""Measurement-protocol unit tests: bench.py's continuity-pass
selection (incl. the r10-ADVICE history-less fallback) and the
scale-probe's shared-melt cache reset. Pure driver-side logic — no
benchmark run needed to pin the policy."""

import bench
from magmapandas_spark.relational import suite


# -- bench.select_retry_suspects ---------------------------------------

def test_suspects_history_based():
    timings = {"a": 9.0, "b": 2.5, "c": 0.4}
    ref = {"a": 2.0, "b": 2.4, "c": 0.3}
    suspects, historyless = bench.select_retry_suspects(timings, ref)
    # a sits >3x its record; b within; c under the 2 s floor
    assert suspects == ["a"]
    assert historyless == set()


def test_suspects_historyless_fallback_vs_run_median():
    # median of mins = 0.5 -> threshold max(0.5, 0.5)*3 = 1.5, floor 2.0
    timings = {f"q{i}": 0.5 for i in range(9)}
    timings["new_slow"] = 6.0       # no ref entry: 6 > 2.0 and > 1.5
    timings["new_mid"] = 1.9        # under the 2 s absolute floor
    suspects, historyless = bench.select_retry_suspects(timings, {})
    assert suspects == ["new_slow"]
    assert historyless == {"new_slow"}


def test_suspects_historyless_respects_median_scale():
    # an expensive suite: median 4 s -> a 6 s new query is NOT a
    # suspect (3x median = 12), so genuinely-heavy new queries are
    # not endlessly re-timed
    timings = {f"q{i}": 4.0 for i in range(9)}
    timings["new"] = 6.0
    suspects, historyless = bench.select_retry_suspects(timings, {})
    assert suspects == [] and historyless == set()


def test_suspects_capped_and_sorted_slowest_first():
    # 20 cheap queries anchor the median at 0.5 s; 12 outliers all
    # qualify but the retry budget caps at the 8 slowest
    timings = {f"q{i}": 0.5 for i in range(20)}
    timings.update({f"n{i}": 10.0 + i for i in range(12)})
    suspects, historyless = bench.select_retry_suspects(timings, {})
    assert len(suspects) == 8
    assert suspects[0] == "n11"  # slowest first
    assert historyless.issuperset(suspects)


def test_suspects_mixed_history_and_new():
    timings = {"old_burst": 7.0, "new_burst": 9.0, "steady": 1.0,
               "pad1": 1.0, "pad2": 1.0}
    ref = {"old_burst": 2.0, "steady": 1.0, "pad1": 1.0, "pad2": 1.0}
    suspects, historyless = bench.select_retry_suspects(timings, ref)
    assert suspects == ["new_burst", "old_burst"]
    assert historyless == {"new_burst"}


# -- bench.select_weather_suspects -------------------------------------

def test_weather_suspects_14x_threshold():
    timings = {"a": 3.0, "b": 2.7, "c": 1.0, "d": 5.0}
    ref = {"a": 2.0, "b": 2.0, "c": 0.5, "d": 4.0}
    # a: 1.5x -> suspect; b: 1.35x -> not; c: 2x but under the 1.5 s
    # floor -> not; d: 1.25x -> not
    assert bench.select_weather_suspects(timings, ref) == ["a"]


def test_weather_suspects_slowest_first_and_capped():
    timings = {f"q{i}": 10.0 + i for i in range(15)}
    ref = {f"q{i}": 1.0 for i in range(15)}
    out = bench.select_weather_suspects(timings, ref)
    assert len(out) == 12
    assert out[0] == "q14"  # slowest first


def test_weather_suspects_no_history_no_suspect():
    # a query with no committed record cannot be weather-adjudicated
    # (the continuity pass's history-less fallback owns that case)
    assert bench.select_weather_suspects({"new": 9.0}, {}) == []


# -- suite.reset_melt_cache --------------------------------------------

def test_reset_melt_cache_drops_memo_and_rebuilds(spark):
    sf = "/root/testdata/sf0.001"
    gf1 = suite.synthetic_melt(spark, sf)
    gf2 = suite.synthetic_melt(spark, sf)
    assert gf1.df is gf2.df  # memoized
    assert (id(spark), sf) in suite._melt_cache
    suite.reset_melt_cache(spark, sf)
    assert (id(spark), sf) not in suite._melt_cache
    gf3 = suite.synthetic_melt(spark, sf)
    assert gf3.df is not gf1.df  # genuinely rebuilt
    # reset on a cold memo is a no-op, not an error
    suite.reset_melt_cache(spark, "/no/such/dir")
    # restore the shared cache for following tests
    gf3.df.count()
