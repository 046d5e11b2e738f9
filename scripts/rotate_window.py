#!/usr/bin/env python
"""Mechanized driver-window rotation (round-7 verdict item 6).

The driver verifies ~50 catalog entries per round (its "window"),
pending-first: ``queries()`` yields entries NOT in ``_DRIVER_GREEN``
before the rest, so whatever the pending set contains is what gets a
fresh external ledger row. Hand-maintaining that set drifted twice
(r5 NOTES vs r6 count; the r6 tally comment omitted
``corpus_dsir_weights``), so this script derives it from the ledger:

- read every ``CORRECTNESS_r*.json`` at the repo root;
- an entry's *last-green round* is the newest round whose row has
  ``err == null`` and every present ``*_match`` flag true;
- rank all registered catalog entries stalest-first by
  ``(last_green_round, registration_index)`` — entries with no green
  row ever (new this round, or only-ever-failed) rank first with
  round -1, then older rounds, ties broken by catalog registration
  order (the order the driver sees);
- the first ``WINDOW`` (=50) entries are the pending set; everything
  else is written to ``spark_eventhubs_spark/_driver_green.py`` as
  the generated ``_DRIVER_GREEN`` frozenset.

Run after adding catalog entries or after a new CORRECTNESS file
lands; ``tests/test_window_rotation.py`` pins that the checked-in
file matches what this script would generate (i.e. rotation actually
happened) and that the pending set fits the window.
"""
from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50
GENERATED = os.path.join(
    REPO, "spark_eventhubs_spark", "_driver_green.py"
)
QUERIES_REL = "spark_eventhubs_spark/queries.py"
GOLDEN_REL = "docs/PLAN_FINGERPRINTS.json"
# Sidecar version for the golden's NORMALIZATION format. Historical
# goldens written under a different normalization (e.g. the r10
# hashpartitioning canonicalization + scan-line expansion) differ
# textually for EVERY entry without any plan change — comparing
# across formats would force-pend the whole catalog. Bump this file
# whenever plan_fingerprints.py's normalization changes; the
# cross-round golden compare only runs when both sides carry the
# same version.
GOLDEN_FMT_REL = "docs/PLAN_FINGERPRINTS_FORMAT"

# Shared drain/flush helpers whose rewrite changes EVERY consuming
# entry's behavior without touching any entry body or plan fingerprint
# (streaming drains leave no batch plan golden). Round-12 ADVICE: the
# r12 _threaded_drain rework force-pended only the two twins whose
# bodies also changed; the other eight rode their old green with a
# changed shared helper. An entry is force-pended when any of these
# helpers' AST-extracted source differs from its last-green commit and
# the entry's current body references the helper (directly, or
# transitively through another listed helper).
SHARED_HELPERS = (
    "_run_stream_to_memory",
    "_threaded_drain",
    "_await_state_flush",
)


def ledger_rounds(repo: str = REPO) -> list[int]:
    """Rounds with a CORRECTNESS file present, ascending."""
    return sorted(
        int(re.search(r"r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    )


def ledger_last_green(
    repo: str = REPO, rounds: list[int] | None = None
) -> dict[str, int]:
    """Map entry name -> newest round with a fully-green ledger row.

    ``rounds`` restricts which CORRECTNESS files are consumed — the
    tests pass the generated file's ``GENERATED_FROM`` stamp here so
    the suite stays green when the driver drops a NEWER ledger row
    after the final commit (round-7 verdict item 1); live-ledger
    drift is surfaced only by ``--check``'s exit code.
    """
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        if rounds is not None and rnd not in rounds:
            continue
        for name, row in json.load(open(path)).items():
            flags = [
                v for k, v in row.items() if k.endswith("_match")
            ]
            if row.get("err") is None and flags and all(
                v is True for v in flags
            ):
                last[name] = max(last.get(name, -1), rnd)
    return last


def rank_stalest(
    registered: list[str],
    last: dict[str, int],
    changed: frozenset[str] | set[str] = frozenset(),
) -> list[str]:
    """All registered entries, stalest first; ties keep catalog order.

    Code-change-aware (round-11 verdict item 3): an entry whose
    implementation changed since its last green driver check ranks
    rank -2, AHEAD even of never-checked entries (-1) — a rewrite
    riding an old green is strictly more dangerous than a new entry,
    which the driver naturally sees pending anyway (this round's
    ``hub_approx_users``: rewritten in ``be10b3f`` on a stale r10
    green, outside the r11 window)."""
    idx = {name: i for i, name in enumerate(registered)}
    return sorted(
        registered,
        key=lambda n: (-2 if n in changed else last.get(n, -1), idx[n]),
    )


def compute_sets(
    registered: list[str],
    last: dict[str, int],
    window: int = WINDOW,
    changed: frozenset[str] | set[str] = frozenset(),
) -> tuple[list[str], list[str]]:
    ranked = rank_stalest(registered, last, changed)
    return ranked[:window], ranked[window:]


def _git_show(repo: str, commit: str, rel: str) -> str | None:
    try:
        return subprocess.check_output(
            ["git", "-C", repo, "show", f"{commit}:{rel}"],
            stderr=subprocess.DEVNULL,
        ).decode()
    except (subprocess.CalledProcessError, OSError):
        return None


def _round_commit(repo: str, rnd: int) -> str | None:
    """The commit that ADDED CORRECTNESS_r<rnd>.json — the repo state
    the driver's round-<rnd> check certified (code committed later was
    never covered by that green)."""
    try:
        out = subprocess.check_output(
            ["git", "-C", repo, "log", "--diff-filter=A", "--format=%H",
             "--", f"CORRECTNESS_r{rnd:02d}.json"],
            stderr=subprocess.DEVNULL,
        ).split()
    except (subprocess.CalledProcessError, OSError):
        return None
    return out[-1].decode() if out else None


def entry_source_block(text: str, fname: str) -> str | None:
    """Extract the top-level ``def fname(...)`` block via the AST
    (``lineno``..``end_lineno``), so neighboring module-level
    constants and col-0 lines inside triple-quoted oracle strings
    can never bleed into the block (a textual scan false-pended
    ``dedup_components`` when an adjacent constant moved).
    Deliberately excludes the @register decorator — oracle drift is
    separately caught by the driver's own hash compare."""
    import ast

    try:
        tree = ast.parse(text)
    except SyntaxError:
        return None
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == fname:
            lines = text.split("\n")
            return "\n".join(lines[node.lineno - 1:node.end_lineno]).rstrip()
    return None


def changed_shared_helpers(cur_src: str, old_src: str) -> frozenset[str]:
    """Listed SHARED_HELPERS whose AST-extracted source differs
    between the two module texts, closed transitively: a helper whose
    current body references a changed helper is itself changed
    (streaming entries name only _run_stream_to_memory, which calls
    _threaded_drain)."""
    dirty = {
        h for h in SHARED_HELPERS
        if entry_source_block(old_src, h) != entry_source_block(cur_src, h)
    }
    for _ in range(len(SHARED_HELPERS)):
        grew = False
        for h in SHARED_HELPERS:
            if h in dirty:
                continue
            body = entry_source_block(cur_src, h) or ""
            if any(d in body for d in dirty):
                dirty.add(h)
                grew = True
        if not grew:
            break
    return frozenset(dirty)


def changed_since_green(
    repo: str, registered: list[str], last: dict[str, int],
    fn_names: dict[str, str],
) -> list[str]:
    """Entries whose entry-function source OR golden plan fingerprint
    differs between the working tree and the commit that recorded
    their last green round. ``fn_names`` maps entry name -> the
    underlying function's __name__ (they usually match, but the
    registration name is the contract, not the symbol).

    Limitation (documented, accepted): a helper-module rewrite that
    changes neither the entry body nor the committed plan fingerprint
    is invisible here — the two signals cover entry-body rewrites
    (``hub_approx_users``) and any helper change that moves the plan
    (the golden is regenerated whenever plans move, pinned by
    tests/test_plan_fingerprints.py)."""
    cur_src = open(os.path.join(repo, QUERIES_REL)).read()
    try:
        cur_golden = json.load(open(os.path.join(repo, GOLDEN_REL)))
    except (OSError, ValueError):
        cur_golden = {}
    try:
        cur_fmt = open(os.path.join(repo, GOLDEN_FMT_REL)).read().strip()
    except OSError:
        cur_fmt = None
    commits: dict[int, str | None] = {}
    old_src: dict[str, str | None] = {}
    old_golden: dict[str, dict | None] = {}
    old_fmt: dict[str, str | None] = {}
    helpers_changed: dict[str, frozenset[str]] = {}
    changed = []
    for name in registered:
        rnd = last.get(name, -1)
        if rnd < 0:
            continue  # never green: already ranked first by -1
        if rnd not in commits:
            commits[rnd] = _round_commit(repo, rnd)
        c = commits[rnd]
        if c is None:
            continue  # no git history (fresh clone): can't judge
        if c not in old_src:
            old_src[c] = _git_show(repo, c, QUERIES_REL)
            g = _git_show(repo, c, GOLDEN_REL)
            try:
                old_golden[c] = json.loads(g) if g else {}
            except ValueError:
                old_golden[c] = {}
            f = _git_show(repo, c, GOLDEN_FMT_REL)
            old_fmt[c] = f.strip() if f else None
            helpers_changed[c] = changed_shared_helpers(
                cur_src, old_src[c] or ""
            )
        if old_src[c] is None:
            continue
        fname = fn_names.get(name, name)
        then_fn = entry_source_block(old_src[c], fname)
        now_fn = entry_source_block(cur_src, fname)
        if then_fn != now_fn:
            changed.append(name)
            continue
        if now_fn and any(h in now_fn for h in helpers_changed[c]):
            changed.append(name)
            continue
        # golden compare only within one normalization format — a
        # format bump rewrites every fingerprint without a plan change
        if (
            cur_fmt is not None
            and old_fmt[c] == cur_fmt
            and old_golden[c].get(name) != cur_golden.get(name)
            and (name in old_golden[c] or name in cur_golden)
        ):
            changed.append(name)
    return changed


def render(
    green: list[str],
    pending: list[str],
    last: dict[str, int],
    rounds: list[int] | None = None,
    changed: list[str] | None = None,
) -> str:
    changed = changed or []
    by_round: dict[int, int] = {}
    for n in pending:
        r = -2 if n in changed else last.get(n, -1)
        by_round[r] = by_round.get(r, 0) + 1
    tally = ", ".join(
        f"{'code-changed' if r == -2 else 'never-checked' if r < 0 else f'r{r:02d}'}: {c}"
        for r, c in sorted(by_round.items())
    )
    # frozenset() literal, valid for the empty case too (a catalog no
    # larger than the window defers nothing — `frozenset({})` would be
    # an empty DICT and `{,}` a SyntaxError the queries.py ImportError
    # bootstrap guard cannot catch)
    if not green:
        body = "_DRIVER_GREEN = frozenset()\n"
    else:
        names = ",\n".join(
            "    " + ", ".join(f'"{n}"' for n in green[i : i + 3])
            for i in range(0, len(green), 3)
        )
        body = f"_DRIVER_GREEN = frozenset({{\n{names},\n}})\n"
    stamp = ""
    if rounds is not None:
        rr = ", ".join(f'"r{r:02d}"' for r in rounds)
        trail = "," if len(rounds) == 1 else ""
        cc = ", ".join(f'"{n}"' for n in changed)
        cctrail = "," if len(changed) == 1 else ""
        stamp = (
            "\n# Ledger rounds consumed by this generation — the rotation\n"
            "# tests re-derive from exactly these files, so a newer\n"
            "# CORRECTNESS file landing later does NOT redden the suite\n"
            "# (`rotate_window.py --check` reports that drift instead).\n"
            f"GENERATED_FROM = ({rr}{trail})\n"
            "# Entries whose implementation (entry-function source or\n"
            "# golden plan fingerprint) changed since their last green\n"
            "# round's commit at generation time: force-pended ahead of\n"
            "# everything (a rewrite must never ride a stale green —\n"
            "# round-11 verdict item 3). Stamped so the rotation tests\n"
            "# re-derive without re-running the git archaeology.\n"
            f"CODE_CHANGED = ({cc}{cctrail})\n"
        )
    return f'''"""GENERATED by scripts/rotate_window.py — do not hand-edit.

``_DRIVER_GREEN`` defers these entries to the back of ``queries()`` so
the driver's ~{WINDOW}-entry correctness window lands on the STALEST
entries first. Pending this rotation: {len(pending)} entries
({tally}); deferred: {len(green)}.
Regenerate with ``python scripts/rotate_window.py`` after adding
catalog entries or when a new CORRECTNESS_r*.json lands.
"""
{stamp}
{body}'''


def main() -> int:
    sys.path.insert(0, REPO)
    from spark_eventhubs_spark import queries as Q

    registered = list(Q._QUERIES)
    rounds = ledger_rounds()
    last = ledger_last_green(rounds=rounds)
    import inspect

    fn_names = {
        n: inspect.unwrap(f).__name__ for n, f in Q._QUERIES.items()
    }
    changed = changed_since_green(REPO, registered, last, fn_names)
    # --force-pend=a,b: names the builder KNOWS changed but the two
    # automatic signals can't see — e.g. an operator-module rewrite
    # whose entry body is a one-line delegate AND whose last-green
    # commit predates the current golden-normalization format (the
    # format gate then mutes the fingerprint compare). Stamped into
    # CODE_CHANGED like any detected change; --check honors the stamp
    # so a generation carrying a force-pend stays check-clean.
    force: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--force-pend="):
            force = [s for s in a.split("=", 1)[1].split(",") if s]
    unknown = [n for n in force if n not in registered]
    if unknown:
        print(f"unknown --force-pend entries: {unknown}")
        return 2
    check = "--check" in sys.argv
    if check and os.path.exists(GENERATED):
        m = re.search(
            r"^CODE_CHANGED = \(([^)]*)\)", open(GENERATED).read(), re.M
        )
        if m:
            stamped = re.findall(r'"([^"]+)"', m.group(1))
            force = [n for n in stamped if n in registered]
    changed = changed + [n for n in force if n not in changed]
    pending, green = compute_sets(registered, last, changed=set(changed))
    text = render(sorted(green), pending, last, rounds, changed)
    current = (
        open(GENERATED).read() if os.path.exists(GENERATED) else None
    )
    if check:
        if current != text:
            print("STALE: _driver_green.py does not match the ledger")
            return 1
        print("OK: _driver_green.py matches the ledger")
        return 0
    with open(GENERATED, "w") as f:
        f.write(text)
    print(
        f"wrote {GENERATED}: {len(green)} deferred, "
        f"{len(pending)} pending (window {WINDOW})"
    )
    for n in pending:
        tag = (
            "changed" if n in changed
            else "new" if last.get(n, -1) < 0
            else f"r{last.get(n):02d}"
        )
        print(f"  pending {tag:7s}  {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
