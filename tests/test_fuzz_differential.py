"""Cross-engine differential fuzz (tools/fuzz_differential.py): seeded
random SQL must agree exactly between Spark and DuckDB. 60 seeds in CI;
`python tools/fuzz_differential.py 300` for the wider sweep."""

from tools.fuzz_differential import gen_query, run


def test_fuzzed_queries_agree_across_engines(spark):
    assert run(60, "/root/testdata/sf0.001", spark=spark) == []


def test_grammar_is_seed_deterministic():
    assert gen_query(7) == gen_query(7)
    assert gen_query(7) != gen_query(8)


def test_fuzzed_join_queries_agree_across_engines(spark):
    from tools.fuzz_differential import run_joins

    assert run_joins(40, "/root/testdata/sf0.001", spark=spark) == []


def test_fuzzed_window_queries_agree_across_engines(spark):
    from tools.fuzz_differential import run_windows

    assert run_windows(40, "/root/testdata/sf0.001", spark=spark) == []


def test_fuzzed_grouping_sets_agree_across_engines(spark):
    from tools.fuzz_differential import run_grouping_sets

    assert run_grouping_sets(40, "/root/testdata/sf0.001", spark=spark) == []


def test_fuzzed_setops_and_subqueries_agree_across_engines(spark):
    from tools.fuzz_differential import run_setops

    assert run_setops(30, "/root/testdata/sf0.001", spark=spark) == []
