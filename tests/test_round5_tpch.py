"""Round-5 TPC-H completion (Q2/Q9/Q11/Q16/Q20/Q21): planted-table
brute-force checks of each query's correlated / nested-subquery
semantics, independent of the sf0.01 DuckDB oracle sweep."""
import numpy as np
import pyarrow as pa
import pytest

from onestools_eventlog_ray.pipelines import relational


def _ds(table: pa.Table):
    import ray.data
    return ray.data.from_arrow(table)


def _dim_tables():
    region = pa.table({"r_regionkey": pa.array([0, 1], pa.int64()),
                       "r_name": pa.array(["ASIA", "EUROPE"])})
    nation = pa.table({"n_nationkey": pa.array([0, 1, 2], pa.int64()),
                       "n_name": pa.array(["NATION_0", "NATION_1",
                                           "NATION_2"]),
                       "n_regionkey": pa.array([0, 0, 1], pa.int64())})
    supplier = pa.table({
        "s_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3", "S4"]),
        "s_nationkey": pa.array([0, 1, 2, 1], pa.int64()),
        "s_acctbal": pa.array([100.0, -5.0, 50.0, 7.5]),
    })
    part = pa.table({
        "p_partkey": pa.array([10, 11, 12], pa.int64()),
        "p_name": pa.array(["red bolt", "red gear", "blue bolt"]),
        "p_brand": pa.array(["Brand#1", "Brand#2", "Brand#2"]),
        "p_type": pa.array(["STANDARD", "STANDARD", "PROMO"]),
        "p_size": pa.array([15, 15, 5], pa.int64()),
        "p_retailprice": pa.array([10.0, 20.0, 30.0]),
    })
    return region, nation, supplier, part


def _li(rows):
    """rows: (orderkey, partkey, suppkey, qty, price, disc, shipdate)"""
    return pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
        "l_quantity": pa.array([float(r[3]) for r in rows]),
        "l_extendedprice": pa.array([float(r[4]) for r in rows]),
        "l_discount": pa.array([float(r[5]) for r in rows]),
        "l_shipdate": pa.array(
            [np.datetime64(r[6], "us").item() for r in rows],
            pa.timestamp("us")),
    })


def test_q2_min_cost_supplier_planted(ray_session):
    region, nation, supplier, part = _dim_tables()
    # part 10+11 are size-15 STANDARD; suppliers 1,2,4 in ASIA (S3 not).
    # part 10: min price 5.00 offered by supplier 2 AND supplier 4 (tie);
    # supplier 3's lower 1.00 offer must be ignored (EUROPE).
    li = _li([
        (1, 10, 1, 1, 9.00, 0.0, "1996-01-01"),
        (1, 10, 2, 1, 5.00, 0.0, "1996-01-02"),
        (2, 10, 4, 1, 5.00, 0.0, "1996-01-03"),
        (2, 10, 3, 1, 1.00, 0.0, "1996-01-04"),
        (3, 11, 2, 1, 7.00, 0.0, "1996-01-05"),
        (3, 12, 1, 1, 2.00, 0.0, "1996-01-06"),   # wrong size/type
    ])
    out = relational.q2_min_cost_supplier(
        _ds(li), part, supplier, nation, region)
    rows = list(zip(out["s_name"].to_pylist(),
                    out["p_partkey"].to_pylist(),
                    out["min_price_e2"].to_pylist()))
    assert ("S2", 10, 500) in rows and ("S4", 10, 500) in rows
    assert ("S2", 11, 700) in rows
    assert all(n != "S3" for n, _, _ in rows) and len(rows) == 3
    # ordering: s_acctbal desc -> S4 (7.50) before S2 (-5.00)
    assert out["s_name"].to_pylist()[0] == "S4"


def test_q9_product_profit_planted(ray_session):
    region, nation, supplier, part = _dim_tables()
    orders = pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array(
            [np.datetime64("1996-03-01", "us").item(),
             np.datetime64("1997-05-01", "us").item()],
            pa.timestamp("us")),
    })
    # profit = price_e2*(100-disc_e2) - qty*retail_e2*100
    li = _li([
        (1, 10, 1, 2, 50.00, 0.10, "1996-04-01"),  # NATION_0, 1996
        (1, 11, 2, 1, 30.00, 0.00, "1996-04-02"),  # NATION_1, 1996
        (2, 10, 2, 3, 90.00, 0.20, "1997-06-01"),  # NATION_1, 1997
        (2, 12, 1, 1, 99.00, 0.00, "1997-06-02"),  # blue part: excluded
    ])
    out = relational.q9_product_profit(
        _ds(li), _ds(orders), part, supplier, nation)
    got = list(zip(out["n_name"].to_pylist(), out["o_year"].to_pylist(),
                   out["profit_e4"].to_pylist()))
    assert got == [
        ("NATION_0", 1996, 5000 * 90 - 2 * 1000 * 100),
        ("NATION_1", 1997, 9000 * 80 - 3 * 1000 * 100),
        ("NATION_1", 1996, 3000 * 100 - 1 * 2000 * 100),
    ]


def test_q11_important_parts_planted(ray_session):
    region, nation, supplier, part = _dim_tables()
    # NATION_1 suppliers: 2 and 4.  Values: part 10 -> 90.00 (e4 via
    # price*disc2), part 11 -> 10.00; only supplier-3 rows are ignored.
    li = _li([
        (1, 10, 2, 1, 90.00, 0.0, "1996-01-01"),
        (1, 11, 4, 1, 10.00, 0.0, "1996-01-02"),
        (2, 12, 3, 1, 500.0, 0.0, "1996-01-03"),   # other nation
    ])
    out = relational.q11_important_parts(
        _ds(li), supplier, nation, frac_num=1, frac_den=2)
    # threshold: value*2 > total -> only part 10 (90 > 100/2)
    assert out["p_partkey"].to_pylist() == [10]
    assert out["value_e4"].to_pylist() == [9000 * 100]


def test_q16_supplier_part_counts_planted(ray_session):
    region, nation, supplier, part = _dim_tables()
    # part 10 excluded (Brand#1), part 12 excluded (PROMO + size 5);
    # supplier 2 excluded (s_acctbal < 0).  Family (Brand#2, STANDARD,
    # 15) gets distinct suppliers {1, 4} from part 11.
    li = _li([
        (1, 11, 1, 1, 1.0, 0.0, "1996-01-01"),
        (1, 11, 1, 1, 1.0, 0.0, "1996-01-02"),     # dup pair
        (2, 11, 4, 1, 1.0, 0.0, "1996-01-03"),
        (2, 11, 2, 1, 1.0, 0.0, "1996-01-04"),     # complaint supplier
        (3, 10, 1, 1, 1.0, 0.0, "1996-01-05"),     # excluded brand
        (3, 12, 1, 1, 1.0, 0.0, "1996-01-06"),     # excluded type/size
    ])
    out = relational.q16_supplier_part_counts(_ds(li), part, supplier)
    assert out["p_brand"].to_pylist() == ["Brand#2"]
    assert out["p_type"].to_pylist() == ["STANDARD"]
    assert out["p_size"].to_pylist() == [15]
    assert out["supplier_cnt"].to_pylist() == [2]


def test_q20_promotion_suppliers_planted(ray_session):
    region, nation, supplier, part = _dim_tables()
    # 'red' part 10 in 1996: qty S2=10, S4=2, S1=3 (total 15, 3 supps).
    # Above average (qty*3 > 15): only S2.  S4 also ships a lot of part
    # 11 but alone (qty*1 > total fails strictly) -> not qualified.
    li = _li([
        (1, 10, 2, 10, 1.0, 0.0, "1996-02-01"),
        (1, 10, 4, 2, 1.0, 0.0, "1996-02-02"),
        (2, 10, 1, 3, 1.0, 0.0, "1996-02-03"),
        (2, 11, 4, 50, 1.0, 0.0, "1996-02-04"),
        (3, 10, 4, 99, 1.0, 0.0, "1997-02-01"),   # wrong year
    ])
    out = relational.q20_promotion_suppliers(
        _ds(li), part, supplier, nation)
    assert out["s_suppkey"].to_pylist() == [2]
    assert out["s_name"].to_pylist() == ["S2"]


def test_q21_waiting_suppliers_planted(ray_session):
    region, nation, supplier, part = _dim_tables()
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderstatus": pa.array(["F", "F", "F", "O"]),
        "o_orderdate": pa.array(
            [np.datetime64(f"1996-01-0{d}", "us").item()
             for d in (1, 1, 1, 1)], pa.timestamp("us")),
    })
    li = _li([
        # order 1: suppliers {2, 1}; only S2 late -> S2 credited
        (1, 10, 2, 1, 1.0, 0.0, "1996-06-01"),
        (1, 10, 1, 1, 1.0, 0.0, "1996-01-15"),
        # order 2: suppliers {2, 3}; BOTH late -> nobody credited
        (2, 10, 2, 1, 1.0, 0.0, "1996-06-01"),
        (2, 10, 3, 1, 1.0, 0.0, "1996-06-02"),
        # order 3: single supplier late -> no second supplier, skipped
        (3, 10, 2, 1, 1.0, 0.0, "1996-06-03"),
        # order 4: status 'O' -> ignored entirely
        (4, 10, 4, 1, 1.0, 0.0, "1996-06-04"),
        (4, 10, 1, 1, 1.0, 0.0, "1996-01-10"),
    ])
    out = relational.q21_waiting_suppliers(
        _ds(li), _ds(orders), supplier, nation)
    assert out["s_suppkey"].to_pylist() == [2]
    assert out["s_name"].to_pylist() == ["S2"]
    assert out["numwait"].to_pylist() == [1]
