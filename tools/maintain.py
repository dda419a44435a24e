"""Out-of-band maintenance runner for every persisted family (r13; the
r12 verdict's task 7). One pass over a base directory:

    python tools/maintain.py --base /data/pipeline_state [--target-mb 256]
        [--ann-rebuild/--no-ann-rebuild] [--dry-run]

walks the base dir's immediate children, classifies each by its own
on-disk metadata (no registry file to drift), and runs the family's
maintenance in the safe order:

- ``manifest.json`` with ``m_bits``            → Bloom dedup index:
  compact_dedup_index (hash-set rewrite, distinct, tombstone purge,
  versioned-filter GC already handled by the family's own commits),
  then — with ``--bloom-rebuild``, the default —
  maybe_rebuild_dedup_index (manifest-read no-op unless the saturation
  trail flags expected_fpp >= the threshold, or when active tombstones
  exist: deletion is only fully materialized — bits re-derived, ledger
  cleared — by the rebuild);
- ``manifest.json`` with ``num_hashes``/``bands`` → MinHash-LSH
  near-dup index: compact_neardup_index (both tables, one atomic flip);
- ``manifest.json`` with ``blocks``+``modality`` → media-fingerprint
  index: compact_media_fp_index (same protocol);
- ``manifest.json`` with ``n_cells``           → IVF-PQ ANN index:
  compact_ann_index FIRST (the rebuild re-trains from the cells table,
  so it should read the deduped rewrite), then — with ``--ann-rebuild``,
  the default — maybe_rebuild_ann_index (manifest-read no-op unless the
  health trend flags residual drift or cell occupancy);
- ``manifest.json`` with ``n`` only            → decontamination index:
  sinks.compact_parquet(distinct=True) over its shingle pairs (the
  family's documented housekeeping — duplicates are correctness-
  neutral, this is purely the small-files/bloat pass);
- ``batch_id=`` partition dirs / a ledger floor manifest → an
  append_once_parquet LEDGER: compact_ledger_parquet (partition-
  preserving, floor-manifest-writing — NEVER the flat compactor, which
  refuses ledgers for exactly this reason).

Everything else is skipped and reported. Output: one JSON line per
action on stderr, a summary JSON on stdout.

SAFETY: every family's compaction/rebuild carries a single-writer
contract — do not run this concurrently with the stream's own epoch
commits. Run it between micro-batch drains (or against a paused
stream), which is the point: maintenance belongs OUT-OF-BAND, not
mid-epoch (the r12 rebuild latency trade, made executable).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def classify(path: str) -> str | None:
    """Family tag for one directory, from its own metadata files."""
    mf_path = os.path.join(path, "manifest.json")
    if os.path.isfile(mf_path):
        try:
            with open(mf_path) as fh:
                mf = json.load(fh)
        except (OSError, ValueError):
            return None
        if "m_bits" in mf:
            return "bloom"
        if "num_hashes" in mf and "bands" in mf:
            return "neardup"
        if "blocks" in mf and "modality" in mf:
            return "mediaindex"
        if "n_cells" in mf:
            return "ann"
        if "n" in mf:
            return "decon"
        return None
    if os.path.isdir(path) and (
        os.path.isfile(os.path.join(path, ".ledger_manifest.json"))
        or any(n.startswith("batch_id=") for n in os.listdir(path))
    ):
        return "ledger"
    return None


def maintain(
    spark, base: str, target_mb: int = 256, ann_rebuild: bool = True, dry_run: bool = False,
    merge_ledger_history: bool = False, bloom_rebuild: bool = True,
) -> list[dict]:
    """Run (or plan, with dry_run) the full maintenance pass. Returns
    one action record per classified child."""
    from lakehouse_spark_spark.operators.annindex import (
        compact_ann_index,
        maybe_rebuild_ann_index,
    )
    from lakehouse_spark_spark.operators.bloom import (
        compact_dedup_index,
        maybe_rebuild_dedup_index,
        rebuild_dedup_index,
    )
    from lakehouse_spark_spark.operators.mediaindex import compact_media_fp_index
    from lakehouse_spark_spark.operators.neardup import compact_neardup_index
    from lakehouse_spark_spark.sources.sinks import (
        compact_ledger_parquet,
        compact_parquet,
        load_tombstones,
    )

    actions: list[dict] = []
    for name in sorted(os.listdir(base)):
        path = os.path.join(base, name)
        if not os.path.isdir(path):
            continue
        family = classify(path)
        if family is None:
            continue
        rec: dict = {"path": path, "family": family}
        if not dry_run:
            if family == "bloom":
                rec["hash_files"] = compact_dedup_index(spark, path, target_mb)
                if bloom_rebuild:
                    # active tombstones force the rebuild (bits cannot
                    # be unset any other way — the deletion remedy);
                    # otherwise it is the saturation policy's call
                    if load_tombstones(spark, path) is not None:
                        rebuild_dedup_index(spark, path)
                        rec["rebuilt"] = True
                    else:
                        rebuilt, _ = maybe_rebuild_dedup_index(spark, path)
                        rec["rebuilt"] = rebuilt
            elif family == "neardup":
                sig, band = compact_neardup_index(spark, path, target_mb)
                rec["signature_files"], rec["band_files"] = sig, band
            elif family == "mediaindex":
                fp, bl = compact_media_fp_index(spark, path, target_mb)
                rec["fingerprint_files"], rec["block_files"] = fp, bl
            elif family == "ann":
                rec["cell_files"] = compact_ann_index(spark, path, target_mb)
                if ann_rebuild:
                    rebuilt, _ = maybe_rebuild_ann_index(spark, path)
                    rec["rebuilt"] = rebuilt
            elif family == "decon":
                tomb = load_tombstones(spark, path)
                rec["shingle_files"] = compact_parquet(
                    spark, os.path.join(path, "shingles"), target_mb, distinct=True,
                    exclude=tomb,
                    exclude_on=["__eval_id"] if tomb is not None else None,
                )
            elif family == "ledger":
                rec["data_files"] = compact_ledger_parquet(
                    spark, path, target_mb, merge_history=merge_ledger_history
                )
        actions.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)
    return actions


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", required=True, help="directory whose children are persisted families")
    ap.add_argument("--target-mb", type=int, default=256)
    ap.add_argument("--ann-rebuild", action=argparse.BooleanOptionalAction, default=True)
    ap.add_argument(
        "--bloom-rebuild", action=argparse.BooleanOptionalAction, default=True,
        help="rebuild-from-hashes when the saturation trail flags OR active "
             "tombstones exist (the deletion remedy — filter bits cannot be unset)",
    )
    ap.add_argument(
        "--merge-ledger-history", action="store_true",
        help="collapse committed ledger epochs into one batch_id=-2 history "
             "partition (provenance kept in orig_batch_id) — the object-store "
             "dir-listing fix; see compact_ledger_parquet(merge_history=True)",
    )
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    from lakehouse_spark_spark.session import get_session

    spark = get_session("maintain")
    spark.sparkContext.setLogLevel("ERROR")
    actions = maintain(
        spark, args.base, args.target_mb, args.ann_rebuild, args.dry_run,
        merge_ledger_history=args.merge_ledger_history,
        bloom_rebuild=args.bloom_rebuild,
    )
    print(json.dumps({"base": args.base, "dry_run": args.dry_run, "actions": actions}))


if __name__ == "__main__":
    main()
