"""CLI driver — the ``ray job submit`` entry point.

    ray job submit -- python -m pdf_to_text_ray.cli \
        --sf-dir /root/testdata/sf0.01 --output /tmp/extracted --resume

Owns the Ray session (guarded init: under ``ray job submit`` the
cluster connection already exists). The library itself never calls
ray.init — see __ray_entry__.py for the driver-side contract.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pdf_to_text_ray")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--output", default=None,
                    help="checkpointed parquet output dir (resumable)")
    ap.add_argument("--resume", action="store_true",
                    help="skip partitions whose lineage already exists")
    ap.add_argument("--dedup-mode", choices=["broadcast", "shuffle"],
                    default="broadcast")
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local mode only; ignored when a cluster exists")
    ap.add_argument("--query", default=None, metavar="NAME",
                    help="run a registered query instead of the "
                         "extraction pipeline (see --list-queries); "
                         "with --output, writes partitioned parquet")
    ap.add_argument("--list-queries", action="store_true")
    ap.add_argument("--export-outputs", default=None, metavar="DIR",
                    help="render per-doc PDF/DOCX/PPTX into DIR "
                         "(the export_all_outputs sink)")
    ap.add_argument("--compact", default=None, metavar="IN_DIR",
                    help="compact a fragmented parquet dir into "
                         "--output (small-file merge, streaming)")
    ap.add_argument("--from-warc", default=None, metavar="DIR",
                    help="extract from WARC shards in DIR instead of "
                         "the synthesized parquet corpus")
    ap.add_argument("--to-warc", default=None, metavar="DIR",
                    help="serialize the corpus to .warc.gz shards in "
                         "DIR and exit")
    args = ap.parse_args(argv)

    if args.list_queries:
        from .pipelines.queries import ORACLE_SQL, QUERIES

        for name in QUERIES:
            tag = "sql" if name in ORACLE_SQL else "rows-only"
            print(f"{name}\t{tag}")
        return 0

    if args.compact and not args.output:
        print("--compact requires --output", file=sys.stderr)
        return 2

    import os

    import ray

    if not ray.is_initialized():
        # honor RAY_ADDRESS: under `ray job submit` / a running cluster
        # it points at the cluster (attach); otherwise start local.
        address = os.environ.get("RAY_ADDRESS", "local")
        kwargs = dict(logging_level=logging.ERROR)
        if address == "local":
            kwargs["include_dashboard"] = False
            if args.num_cpus:
                kwargs["num_cpus"] = args.num_cpus
        ray.init(address=address, **kwargs)

    if args.compact:
        from .sources.compact import compact_parquet

        try:
            stats = compact_parquet(args.compact, args.output)
        except ValueError as exc:
            print(str(exc), file=sys.stderr)
            return 2
        print(json.dumps(stats))
        ray.shutdown()
        return 0

    if args.export_outputs:
        import ray.data

        from .sinks.render import export_all_outputs

        docs = ray.data.read_parquet(
            f"{args.sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        manifest = export_all_outputs(
            docs,
            args.export_outputs,
            num_partitions=args.num_partitions,
            resume=args.resume,
        )
        n = manifest.count()
        print(json.dumps({"docs_exported": n, "output": args.export_outputs}))
        ray.shutdown()
        return 0

    if args.query:
        from .pipelines.queries import QUERIES

        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; see --list-queries",
                  file=sys.stderr)
            return 2
        result = QUERIES[args.query](args.sf_dir)
        # queries may return a Dataset, a pyarrow Table, or a pandas
        # DataFrame (same dispatch as bench._consume)
        import pandas as pd
        import pyarrow as pa_mod

        import ray.data as _rd

        if isinstance(result, pd.DataFrame):
            result = _rd.from_pandas(result)
        elif isinstance(result, pa_mod.Table):
            result = _rd.from_arrow(result)
        if args.output:
            # write_parquet appends uniquely-named files — rerunning
            # into a non-empty dir would silently duplicate rows, so
            # refuse instead
            if os.path.isdir(args.output) and os.listdir(args.output):
                print(
                    f"output dir {args.output!r} is not empty; "
                    "use a fresh dir",
                    file=sys.stderr,
                )
                return 2
            result.write_parquet(args.output)
            n = _rd.read_parquet(args.output).count()
        else:
            n = result.count()
        print(json.dumps(
            {"query": args.query, "rows": n, "output": args.output}
        ))
        ray.shutdown()
        return 0

    # extraction paths only — the utility branches above never pay for
    # the pipeline import chain or a config they don't use
    from dataclasses import replace

    from .config import DEFAULT_CONFIG
    from .pipelines.extract import (
        run_extraction_on,
        stale_droplist,
        synthesize_docs,
        synthesize_keys,
    )

    if args.to_warc:
        from .sources.warc import write_warc_shards

        # shard names depend on block layout — writing a second
        # generation beside an old one would mix both into any later
        # --from-warc read (duplicate records), so refuse like the
        # --query/--output path does
        if os.path.isdir(args.to_warc) and os.listdir(args.to_warc):
            print(
                f"warc dir {args.to_warc!r} is not empty; use a fresh dir",
                file=sys.stderr,
            )
            return 2

        manifest = write_warc_shards(
            synthesize_docs(args.sf_dir, args.repeat), args.to_warc
        )
        import pyarrow.compute as _pc

        print(json.dumps({
            "shards": manifest.num_rows,
            "records": int(_pc.sum(manifest["n_records"]).as_py() or 0),
            "output": args.to_warc,
        }))
        ray.shutdown()
        return 0

    if args.from_warc:
        from .sources.warc import read_warc, warc_keys

        docs = read_warc(args.from_warc)
        keys = lambda: warc_keys(args.from_warc)  # noqa: E731
    else:
        docs = synthesize_docs(args.sf_dir, args.repeat)
        keys = lambda: synthesize_keys(args.sf_dir, args.repeat)  # noqa: E731

    cfg = replace(
        DEFAULT_CONFIG,
        dedup_mode=args.dedup_mode,
        num_partitions=args.num_partitions,
        output_dir=args.output,
    )

    if args.output:
        from .state.checkpoint import completed_partitions, run_checkpointed

        if not args.resume:
            done = completed_partitions(args.output)
            if done:
                print(
                    f"output dir has {len(done)} completed partitions; "
                    "pass --resume to skip them or use a fresh dir",
                    file=sys.stderr,
                )
                return 2
        dups = stale_droplist(keys())
        res = run_checkpointed(docs, cfg, dups)
        summary = {
            "computed_partitions": res["computed"],
            "skipped_partitions": res["skipped"],
            "urls": int(res["lineage"]["urls"].sum()) if res["computed"] else 0,
            "docs_failed": int(res["lineage"]["docs_failed"].sum())
            if res["computed"] else 0,
            "output": args.output,
        }
    else:
        ds = run_extraction_on(docs, keys, cfg)
        n = ds.count()
        summary = {"urls": n, "output": None}

    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
