"""pompspark.recrawl: adaptive revisit intervals (halve on change,
double on stability) + the epoch handoff into seed_frontier."""

from __future__ import annotations

from pompspark.recrawl import due_seeds, revisit_schedule


def _hist(spark, rows):
    return spark.createDataFrame(rows, "url string, round int, text string")


def test_revisit_schedule_policy_matrix(spark):
    h = _hist(spark, [
        ("u_changed", 1, "version one"), ("u_changed", 5, "version two"),
        ("u_static", 1, "same text"),    ("u_static", 5, "same text"),
        ("u_single", 3, "only fetch"),
        # three fetches: only the last two count (5 vs 9: changed)
        ("u_multi", 1, "a"), ("u_multi", 5, "a"), ("u_multi", 9, "b"),
    ])
    got = {
        r.url: (r.last_round, r.changed, r.interval, r.due)
        for r in revisit_schedule(h, current_round=12, base_interval=8).collect()
    }
    assert got == {
        "u_changed": (5, 1, 4, 1),    # halved to 4; 12-5 >= 4 -> due
        "u_static": (5, 0, 16, 0),    # doubled to 16; not due
        "u_single": (3, 0, 8, 1),     # base 8; 12-3 >= 8 -> due
        "u_multi": (9, 1, 4, 0),      # changed, but 12-9 < 4
    }


def test_revisit_interval_bounds(spark):
    h = _hist(spark, [
        ("chg", 1, "x"), ("chg", 2, "y"),
        ("sta", 1, "x"), ("sta", 2, "x"),
    ])
    got = {
        r.url: r.interval
        for r in revisit_schedule(
            h, current_round=10, base_interval=8, min_interval=6, max_interval=10
        ).collect()
    }
    assert got == {"chg": 6, "sta": 10}  # clamped both ways


def test_due_seeds_feed_next_epoch(spark, tmp_path):
    """The epoch loop: schedule -> due urls -> seed_frontier of a
    FRESH epoch workdir crawls exactly those pages again."""
    from pompspark.engine import simulated_engine
    from pompspark.fixtures import small_pages_df

    h = _hist(spark, [
        ("http://a.example/p0", 1, "v1"), ("http://a.example/p0", 5, "v2"),
        ("http://b.example/p0", 1, "s"), ("http://b.example/p0", 5, "s"),
    ])
    seeds = due_seeds(revisit_schedule(h, current_round=12))
    assert [r.url for r in seeds.collect()] == ["http://a.example/p0"]

    e = simulated_engine(spark, str(tmp_path / "epoch2"), small_pages_df(spark),
                         per_round_budget=1, per_host_budget=1)
    assert e.seed_frontier(seeds) == 1
    e.run(max_rounds=1)
    assert [r.url for r in e.trace().collect()] == ["http://a.example/p0"]
