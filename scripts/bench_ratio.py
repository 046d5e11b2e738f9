#!/usr/bin/env python3
"""Compare two bench.py records entry-by-entry: per-query wall ratio
(big/small), sorted worst-first — the quick read on which operators
scale and which carry data-volume-proportional cost.

With ``--emit`` (round-9 verdict item 6) the analysis is also written
INTO the big record as a ``ratios`` section, so the scale claim is
machine-checkable from the artifact alone: per entry the small/big
seconds, the ratio, and a classification —

- ``superlinear``       ratio > data factor (investigate: a real
                        scale-killer unless the output itself grows
                        superlinearly);
- ``output-bound``      entries whose bench cost is dominated by
                        collect()ing a result that grows with the
                        corpus (per-doc/per-user/per-pair outputs —
                        the ratio tracks result cardinality, not plan
                        cost);
- ``backlog-proportional`` streaming twins: the drain replays the
                        whole k-times-larger backlog by definition;
- ``at-or-below-linear`` everything else.

Usage: python scripts/bench_ratio.py <small.json> <big.json> [top_n]
       [--emit] [--factor=K]

``--factor`` overrides the data factor when either record's ``sf`` is
a replica dir that did not parse (bench reports sf=-1 there).
"""

from __future__ import annotations

import json
import sys

# Entries whose RESULT cardinality scales with the corpus (one row per
# document / user / day / pair ...), so the bench figure — a collect()
# — is dominated by driver-side materialization at big sf. Kept
# explicit (not inferred from ratios) so a plan regression on one of
# these can still surface as ratio >> data factor.
OUTPUT_BOUND = {
    "s2_unpivot_quality", "embed_neardup_pairs", "hub_asof_join",
    "dedup_chunk_clean", "dedup_exact", "dedup_minhash_signatures",
    "dedup_simhash", "dedup_substring_spans", "dedup_span_profile",
    "text_token_entropy", "text_kl_divergence", "text_token_count",
    "text_quality_score", "text_lang_id", "text_fingerprint",
    "text_gopher_filters", "corpus_quality_report", "multimodal_metadata",
    "multimodal_bmp_stats", "multimodal_wav_stats", "multimodal_avi_stats",
    "multimodal_frame_sample", "embed_kmeans_assign", "embed_semdedup",
    "embed_label_centroids", "corpus_curation_decisions", "scd2_state_history",
    "hub_sessionization", "ts_ewma_hourly", "g3_daily_reconciliation",
    "corpus_dsir_weights", "corpus_hash_split", "corpus_stratified_sample",
    "corpus_pack_documents", "corpus_pii_scan", "corpus_repetition_stats",
    "corpus_source_quality", "corpus_quantize_embeddings",
    "text_winnow_fingerprints", "dedup_components", "dedup_incremental_ingest",
    "hub_salted_user_counts", "hub_retention_cohorts", "dedup_keep_best",
    "corpus_perplexity_buckets", "ts_gapfill_interpolate",
    # 3 rows per cohort document (1% doc_id cohort since r12): output
    # is collect-bound, cohort-sized — and the >factor flag above
    # still fires if the plan itself regresses past the data factor
    "text_token_positions",
}


# A streaming twin's drain replays the whole k-times-larger backlog,
# so its EXPECTED ratio is ~factor; only beyond factor * this slack is
# the twin flagged superlinear (a real scale regression on top of the
# replay cost — ADVICE r9: the stream_ shortcut must not mask those).
STREAM_SLACK = 1.5


def classify(name: str, ratio: float, factor: float | None) -> str:
    if name.startswith("stream_"):
        if factor and ratio > factor * STREAM_SLACK:
            return "superlinear"
        return "backlog-proportional"
    if factor and ratio > factor:
        return "superlinear"
    if name in OUTPUT_BOUND:
        return "output-bound"
    return "at-or-below-linear"


def _load(path: str) -> dict:
    d = json.load(open(path))
    # the driver's BENCH_r{N}.json wraps the bench line under "parsed"
    # (which is null when the driver failed to parse the line — fall
    # back to the record itself and fail with a clear message below)
    d = d.get("parsed") or d
    if "queries" not in d:
        raise SystemExit(
            f"{path}: no per-query timings (driver 'parsed' is null?) — "
            "pass a raw bench.py record instead"
        )
    return d


def main() -> int:
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    emit = "--emit" in flags
    explicit = next(
        (float(f.split("=", 1)[1]) for f in flags if f.startswith("--factor=")),
        None,
    )
    small = _load(args[0])
    big = _load(args[1])
    top_n = int(args[2]) if len(args) > 2 else 15
    qs, qb = small["queries"], big["queries"]
    common = sorted(set(qs) & set(qb))
    if explicit is not None:
        factor = explicit
    else:
        try:
            factor = float(big.get("sf")) / float(small.get("sf"))
        except (TypeError, ValueError, ZeroDivisionError):
            factor = None
        # bench reports sf=-1 for replica dirs whose name carries no
        # scale — a negative/zero factor would classify EVERYTHING as
        # superlinear, so treat it as unknown instead
        if factor is not None and factor <= 0:
            factor = None
    ratios = sorted(
        ((qb[k] / qs[k] if qs[k] > 0 else float("inf"), k) for k in common),
        reverse=True,
    )
    n = len(ratios)
    med = sorted(r for r, _ in ratios)[n // 2]
    print(
        f"{n} common entries; data ratio "
        f"{big.get('sf', '?')}/{small.get('sf', '?')}; "
        f"wall {small['value']}s -> {big['value']}s; median ratio {med:.2f}x"
    )
    for r, k in ratios[:top_n]:
        print(f"  {r:7.1f}x  {k}  ({qs[k]}s -> {qb[k]}s)  "
              f"[{classify(k, r, factor)}]")
    missing = sorted(set(qs) - set(qb))
    if missing:
        print("MISSING in big:", missing)
    if big.get("failures"):
        print("FAILURES:", json.dumps(big["failures"], indent=1))

    if emit:
        raw = json.load(open(args[1]))
        target = raw.get("parsed", raw)
        target["ratios"] = {
            "vs": args[0].rsplit("/", 1)[-1],
            "data_factor": factor,
            "median_ratio": round(med, 2),
            "n_superlinear": sum(
                1 for r, k in ratios
                if classify(k, r, factor) == "superlinear"
            ),
            "entries": {
                k: {
                    "small_s": qs[k],
                    "big_s": qb[k],
                    "ratio": round(r, 2),
                    "class": classify(k, r, factor),
                }
                for r, k in ratios
            },
        }
        with open(args[1], "w") as f:
            json.dump(raw, f, indent=1)
        print(f"emitted ratios section into {args[1]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
