"""Pins the mechanized driver-window rotation (round-7 verdict item
6 / ADVICE r6 item 2): the generated ``_driver_green.py`` must match
what ``scripts/rotate_window.py`` derives from the CORRECTNESS ledger,
and the pending set must fit the driver's ~50-entry window — the
invariant the hand-maintained set silently violated in round 6
(51 pending, ``w2_order_value_deciles`` fell outside the window)."""
import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rotate_mod():
    spec = importlib.util.spec_from_file_location(
        "rotate_window", os.path.join(REPO, "scripts", "rotate_window.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pending_set_fits_driver_window():
    from spark_eventhubs_spark import queries as Q

    pending = [n for n in Q._QUERIES if n not in Q._DRIVER_GREEN]
    assert 0 < len(pending) <= _rotate_mod().WINDOW
    # pending-first ordering is what the driver actually sees
    assert list(Q.queries())[: len(pending)] == pending


def test_generated_file_matches_ledger():
    """The checked-in _driver_green.py IS what the script would emit:
    the deferred set is exactly the registered entries minus the 50
    stalest by (last-green round, catalog order)."""
    rot = _rotate_mod()
    from spark_eventhubs_spark import queries as Q

    registered = list(Q._QUERIES)
    last = rot.ledger_last_green()
    pending, green = rot.compute_sets(registered, last)
    assert Q._DRIVER_GREEN == frozenset(green)
    assert rot.render(sorted(green), pending, last) == open(
        rot.GENERATED
    ).read()


def test_pending_is_the_stalest_slice():
    """No deferred entry is staler than any pending entry."""
    rot = _rotate_mod()
    from spark_eventhubs_spark import queries as Q

    last = rot.ledger_last_green()
    pending = [n for n in Q._QUERIES if n not in Q._DRIVER_GREEN]
    newest_pending = max(last.get(n, -1) for n in pending)
    oldest_deferred = min(
        last.get(n, -1) for n in Q._DRIVER_GREEN
    )
    assert oldest_deferred >= newest_pending
