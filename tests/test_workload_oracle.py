"""Every registered workload query must hash-match its DuckDB oracle —
the local twin of the driver's CORRECTNESS_r{N}.json gate."""

from __future__ import annotations

import pytest

from nbi_oedi_etl_v2_spark import workload
from nbi_oedi_etl_v2_spark.testing import check_query

ALL_SPECS = workload.all_specs()  # includes pytest-only (driver=False)
ORACLE_SPECS = [s for s in ALL_SPECS.values() if s.oracle is not None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_query_matches_oracle(spark, sf_dir, spec):
    problems = check_query(spark, sf_dir, spec.fn, spec.oracle)
    assert not problems, f"{spec.name}:\n" + "\n".join(problems)


def test_every_spec_carries_an_oracle():
    """Since round 5 every spec is DuckDB-oracle-able (the sketch/
    approx ones via in-plan invariant columns) — a spec landing
    without an oracle is a regression, not a category."""
    assert [s.name for s in ALL_SPECS.values() if s.oracle is None] == []


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    df = entry_mod.entry(spark)
    assert df.count() > 0


# Round-6 rotation contract (VERDICT r5 "What\'s wrong" #2): the
# export is COMPUTED from the committed verification history
# (rotation.py), and the staleness bound is asserted here — every
# spec re-earns a driver row within STALENESS_BOUND_ROUNDS rounds.


def test_driver_export_policy():
    from nbi_oedi_etl_v2_spark import rotation

    q = workload.queries()
    export = set(q)
    assert len(q) == workload.DRIVER_QUERY_CAP
    # PIN — the port of the reference\'s sql/saved-queries.sql:10-45;
    # the literal parity contract never rotates out (VERDICT r3 §gap 2)
    assert rotation.PIN <= export
    # every never-driver-verified spec gets its first row this round,
    # except an explicit (documented, one-round-only) deferral
    never = {s for s in ALL_SPECS if s not in rotation.VERIFIED_ROUNDS}
    assert never - rotation.DEFER_FIRST_ROW <= export, never - export
    # deferrals must be never-verified specs (a spec with a green row
    # can't hide here) and must not also hold a slot
    assert rotation.DEFER_FIRST_ROW <= never
    assert not (rotation.DEFER_FIRST_ROW & export)
    # operators whose code changed this round re-prove themselves,
    # and the VERDICT-advised re-verifications hold slots
    assert rotation.TOUCH <= export
    assert rotation.ADVISED <= export
    # the staleness bound: no unexported spec is more than
    # STALENESS_BOUND_ROUNDS rounds past its last green driver row
    for s in set(ALL_SPECS) - export - rotation.DEFER_FIRST_ROW:
        age = rotation.CURRENT_ROUND - rotation.VERIFIED_ROUNDS[s]
        assert age <= rotation.STALENESS_BOUND_ROUNDS, (s, age)
    # the fill is oldest-first: no unexported spec may be STALER than
    # any exported fill slot (fill = export minus the forced sets)
    forced = rotation.PIN | rotation.TOUCH | rotation.ADVISED | never
    fill_ages = [
        rotation.CURRENT_ROUND - rotation.VERIFIED_ROUNDS[s]
        for s in export - forced
    ]
    if fill_ages:
        newest_fill = min(fill_ages)
        for s in set(ALL_SPECS) - export - rotation.DEFER_FIRST_ROW:
            age = rotation.CURRENT_ROUND - rotation.VERIFIED_ROUNDS[s]
            assert age <= newest_fill, (s, age, newest_fill)


def test_rotation_capacity_is_prospective():
    """VERDICT r9 missing #4: a registry of R specs refreshed at most
    cap rows/round cannot honour a staleness bound below ceil(R/cap).
    Assert the ceiling HERE, so growth past cap*bound specs fails the
    round the spec lands — not the round the fill first overflows."""
    import math

    from nbi_oedi_etl_v2_spark import rotation

    R = len(ALL_SPECS)
    cap = workload.DRIVER_QUERY_CAP
    assert math.ceil(R / cap) <= rotation.STALENESS_BOUND_ROUNDS, (
        f"registry has {R} specs; cap {cap} rows/round can only bound "
        f"staleness at ceil({R}/{cap})={math.ceil(R / cap)} > "
        f"{rotation.STALENESS_BOUND_ROUNDS} — raise the bound "
        "deliberately (and update rotation.py's notes) before landing "
        "more specs"
    )


def test_verified_rounds_ledger_is_plausible():
    """The ledger only names registered specs with rounds in
    [1, CURRENT_ROUND) — catches typos when it\'s updated each round."""
    from nbi_oedi_etl_v2_spark import rotation

    unknown = set(rotation.VERIFIED_ROUNDS) - set(ALL_SPECS)
    assert not unknown, unknown
    assert all(
        1 <= r < rotation.CURRENT_ROUND
        for r in rotation.VERIFIED_ROUNDS.values()
    )
