"""Pins the mechanized driver-window rotation (round-7 verdict item
6 / ADVICE r6 item 2, decoupled from the live ledger per round-7
verdict item 1): the generated ``_driver_green.py`` must match what
``scripts/rotate_window.py`` derives from the ledger rounds STAMPED
into it (``GENERATED_FROM``), and the pending set must fit the
driver's ~50-entry window. The driver drops a new CORRECTNESS file
AFTER the round's final commit, so asserting against the live ledger
glob made the suite red every inter-round gap by construction; live
drift is now surfaced only by ``rotate_window.py --check``'s exit
code (a round-start signal), never a pytest failure.
"""
import importlib.util
import json
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rotate_mod():
    spec = importlib.util.spec_from_file_location(
        "rotate_window", os.path.join(REPO, "scripts", "rotate_window.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _stamped_rounds():
    from spark_eventhubs_spark import _driver_green as G

    return [int(r.lstrip("r")) for r in G.GENERATED_FROM]


def test_pending_set_fits_driver_window():
    from spark_eventhubs_spark import queries as Q

    pending = [n for n in Q._QUERIES if n not in Q._DRIVER_GREEN]
    assert 0 < len(pending) <= _rotate_mod().WINDOW
    # pending-first ordering is what the driver actually sees
    assert list(Q.queries())[: len(pending)] == pending


def test_generated_file_matches_stamped_ledger():
    """The checked-in _driver_green.py IS what the script would emit
    from the ledger rounds stamped into its GENERATED_FROM header —
    byte-for-byte, independent of any ledger row that landed later."""
    rot = _rotate_mod()
    from spark_eventhubs_spark import _driver_green as G
    from spark_eventhubs_spark import queries as Q

    rounds = _stamped_rounds()
    registered = list(Q._QUERIES)
    last = rot.ledger_last_green(rounds=rounds)
    changed = list(G.CODE_CHANGED)
    pending, green = rot.compute_sets(registered, last, changed=set(changed))
    assert Q._DRIVER_GREEN == frozenset(green)
    assert rot.render(sorted(green), pending, last, rounds, changed) == open(
        rot.GENERATED
    ).read()


def test_stamped_rounds_exist_and_are_contiguous_prefix():
    """The stamp names real ledger files and never skips a round that
    existed at generation time (a gap would mean hand-editing)."""
    rounds = _stamped_rounds()
    assert rounds == sorted(rounds)
    for r in rounds:
        assert os.path.exists(
            os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json")
        )
    live = _rotate_mod().ledger_rounds()
    # stamped rounds are a prefix of the live ledger (newer rounds may
    # have landed since generation; older ones cannot disappear)
    assert live[: len(rounds)] == rounds


def test_pending_is_the_stalest_slice():
    """No deferred entry is staler than any pending entry, judged by
    the stamped ledger rounds — with code-changed entries ranked -2
    (they must never be deferred at all)."""
    rot = _rotate_mod()
    from spark_eventhubs_spark import _driver_green as G
    from spark_eventhubs_spark import queries as Q

    last = rot.ledger_last_green(rounds=_stamped_rounds())
    changed = set(G.CODE_CHANGED)

    def rank(n):
        return -2 if n in changed else last.get(n, -1)

    pending = [n for n in Q._QUERIES if n not in Q._DRIVER_GREEN]
    assert not changed & set(Q._DRIVER_GREEN)
    assert min(rank(n) for n in Q._DRIVER_GREEN) >= max(
        rank(n) for n in pending
    )


def test_newer_ledger_row_flips_check_but_not_suite(tmp_path):
    """Round-7 verdict item 1's Done condition: simulate the driver
    dropping a NEWER CORRECTNESS file — the derivation-from-stamp
    assertions above stay green (they ignore it), while the text the
    script would now generate DIFFERS from the checked-in file, i.e.
    ``--check`` flips to STALE (exit 1)."""
    rot = _rotate_mod()
    from spark_eventhubs_spark import queries as Q

    for r in rot.ledger_rounds():
        shutil.copy(
            os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json"),
            tmp_path / f"CORRECTNESS_r{r:02d}.json",
        )
    nxt = max(rot.ledger_rounds()) + 1
    # a fresh green row for one currently-pending entry
    pending = [n for n in Q._QUERIES if n not in Q._DRIVER_GREEN]
    (tmp_path / f"CORRECTNESS_r{nxt:02d}.json").write_text(
        json.dumps(
            {pending[0]: {"err": None, "rows_match": True}}
        )
    )
    rounds = rot.ledger_rounds(repo=str(tmp_path))
    assert nxt in rounds
    last = rot.ledger_last_green(repo=str(tmp_path), rounds=rounds)
    new_pending, new_green = rot.compute_sets(list(Q._QUERIES), last)
    new_text = rot.render(sorted(new_green), new_pending, last, rounds)
    # the live-ledger text differs -> --check would report STALE ...
    assert new_text != open(rot.GENERATED).read()
    # ... while the stamped derivation (the pytest contract) is intact:
    from spark_eventhubs_spark import _driver_green as G

    stamped = rot.ledger_last_green(rounds=_stamped_rounds())
    p2, g2 = rot.compute_sets(
        list(Q._QUERIES), stamped, changed=set(G.CODE_CHANGED)
    )
    assert frozenset(g2) == Q._DRIVER_GREEN


def test_code_changed_entries_rank_ahead_of_everything():
    """The round-11 item-3 rule, pinned on synthetic data: an entry
    rewritten since its last green ranks BEFORE stale and even
    never-checked entries, and can never be deferred while unchanged
    stale entries fill the window."""
    rot = _rotate_mod()
    registered = [f"e{i:02d}" for i in range(6)]
    last = {"e00": 5, "e01": 1, "e02": 3, "e04": 2, "e05": 4}  # e03 new
    pending, green = rot.compute_sets(
        registered, last, window=3, changed={"e05"}
    )
    # e05 (freshest green but rewritten) first, then never-checked
    # e03, then stalest green e01; e00/e02/e04 defer
    assert pending == ["e05", "e03", "e01"]
    assert green == ["e04", "e02", "e00"]


def test_entry_source_block_is_ast_precise():
    """Neighboring module constants and col-0 SQL inside strings must
    not bleed into the extracted block (the dedup_components false
    positive), and a body edit must change the block."""
    rot = _rotate_mod()
    text = (
        '@register(\n    "x",\n    """SELECT 1\nFROM t""",\n)\n'
        "def x(spark, sf):\n    return 1\n\n\n"
        '_CONST = """\nSELECT col0\n"""\n\n\n'
        "def y(spark, sf):\n    return 2\n"
    )
    block = rot.entry_source_block(text, "x")
    assert block == "def x(spark, sf):\n    return 1"
    assert rot.entry_source_block(text, "y") == "def y(spark, sf):\n    return 2"
    assert rot.entry_source_block(text, "z") is None
    edited = text.replace("return 1", "return 99")
    assert rot.entry_source_block(edited, "x") != block
    # a move of the neighboring constant must NOT change x's block
    moved = text.replace('_CONST = """\nSELECT col0\n"""\n\n\n', "")
    assert rot.entry_source_block(moved, "x") == block


def test_code_changed_stamp_is_pending_never_deferred():
    """Every entry the generation stamped as CODE_CHANGED must be in
    the pending set — a stamped-but-deferred entry would mean the
    force-pend rank was ignored. (Deliberately NOT pinned to specific
    entry names: the r12 version asserted hub_approx_users, which
    went green the very next round and made the suite red — the
    stamp's content is round-state, the invariant is structural.)"""
    from spark_eventhubs_spark import _driver_green as G
    from spark_eventhubs_spark import queries as Q

    assert not set(G.CODE_CHANGED) & Q._DRIVER_GREEN


def test_shared_helper_change_is_transitive():
    """The r12-ADVICE blind spot: a rewrite of a shared drain helper
    must count as a change for every consuming entry, including
    consumers that only reference it indirectly through another
    listed helper."""
    rot = _rotate_mod()
    old = (
        "def _threaded_drain(t, b, n):\n    return 1\n\n\n"
        "def _run_stream_to_memory(df, name):\n"
        "    _threaded_drain(None, 300, name)\n"
    )
    # only the INNER helper's body changes
    cur = old.replace("return 1", "return 2")
    dirty = rot.changed_shared_helpers(cur, old)
    assert "_threaded_drain" in dirty
    # the outer helper references the changed inner one -> transitively dirty
    assert "_run_stream_to_memory" in dirty
    # identical texts -> nothing dirty
    assert rot.changed_shared_helpers(old, old) == frozenset()
