"""TPC-H shape queries (Q7/Q8/Q10/Q13/Q14 adapted to the testdata
schema): plan-shape pins (broadcasts where promised, filters pushed to
the scans) and cross-table invariants."""

import pytest

import __spark_entry__ as E


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_volume_shipping_broadcasts_nation_into_dims(spark, sf):
    df = E.q_volume_shipping(spark, sf)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # the nation prefilter reaches the nation scan
    assert plan.count("BroadcastExchange") >= 2


def test_returned_items_pushes_returnflag(spark, sf):
    df = E.q_returned_items(spark, sf)
    plan = _plan(df)
    assert "PushedFilters" in plan and "l_returnflag" in plan
    rows = df.collect()
    assert all(r.revenue > 0 and r.n_items >= 1 for r in rows)


def test_cust_order_dist_accounts_for_every_customer(spark, sf):
    dist = {r.c_count: r.custdist for r in E.q_cust_order_dist(spark, sf).collect()}
    n_cust = spark.read.parquet(f"{sf}/customer.parquet").count()
    assert sum(dist.values()) == n_cust
    # zero-bucket semantics: customers without qualifying orders
    o = spark.read.parquet(f"{sf}/orders.parquet").filter(
        "o_orderpriority <> '1-URGENT'"
    )
    c = spark.read.parquet(f"{sf}/customer.parquet")
    n_zero = c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).count()
    assert dist.get(0, 0) == n_zero


def test_market_share_and_promo_bounds(spark, sf):
    for r in E.q_market_share(spark, sf).collect():
        assert 0.0 <= r.mkt_share <= 1.0
        assert r.nation_volume <= r.total_volume
    row = E.q_promo_share(spark, sf).collect()[0]
    assert 0.0 <= row.promo_share <= 100.0
    assert row.promo_revenue <= row.total_revenue
