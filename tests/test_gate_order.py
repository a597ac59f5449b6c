"""Driver-gate ordering contract (VERDICT r7 item #1).

The round driver snapshots only the first ~50 ``queries()`` entries into
CORRECTNESS_r{N}.json. These tests pin that every entry that must land a
driver-verified row this round sits inside that window, and that the
rotation never silently drops an entry from the catalog.
"""

from slurm2sql_spark import catalog


def test_priority_entries_inside_gate_window():
    names = list(catalog.QUERIES)
    window = set(names[: catalog._GATE_WINDOW])
    missing = [n for n in catalog._GATE_PRIORITY if n not in window]
    assert not missing, f"priority entries outside driver gate window: {missing}"


def test_gate_reorder_is_a_permutation():
    # Reordering must not drop or duplicate entries.
    names = list(catalog.QUERIES)
    assert len(names) == len(set(names))
    # Every registered spec still present with a callable + doc'd oracle slot.
    for spec in catalog.QUERIES.values():
        assert callable(spec.spark)


def test_tail_entries_are_only_stable_micros():
    # Anything rotated past the window must be an explicitly listed
    # long-stable micro — never a new or never-gated entry.
    names = list(catalog.QUERIES)
    tail = names[catalog._GATE_WINDOW :]
    allowed = set(catalog._GATE_TAIL)
    stray = [n for n in tail if n not in allowed]
    assert not stray, f"non-tail entries fell outside the gate window: {stray}"
