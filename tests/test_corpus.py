"""Corpus-prep additions: train/val split, PII redaction, repetition
gates (stages/corpus.py) — unit pins plus query-level checks (the SQL
oracles are cross-checked by tools/check_oracle.py and the driver)."""

import pyarrow as pa

from pdf_to_text_ray.stages.corpus import (
    inject_pii,
    pii_redact_batch,
    redact_pii,
    repetition_batch,
    repetition_stats,
    split_of,
    train_val_split_batch,
)


def test_split_deterministic_and_roughly_90_10():
    splits = [split_of(i) for i in range(10_000)]
    assert splits == [split_of(i) for i in range(10_000)]
    frac = splits.count("train") / len(splits)
    assert 0.88 < frac < 0.92


def test_split_batch_schema():
    out = train_val_split_batch(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64())})
    )
    assert out.column_names == ["doc_id", "split"]
    assert set(out["split"].to_pylist()) <= {"train", "val"}


def test_redact_order_and_counts():
    red, ne, ni, np_ = redact_pii(
        "write a.b-c%d+e@sub.domain.org from 192.168.0.1 call +1-555-0199 ok"
    )
    assert (ne, ni, np_) == (1, 1, 1)
    assert red == "write [EMAIL] from [IP] call [PHONE] ok"


def test_redact_no_false_positives_on_plain_text():
    red, ne, ni, np_ = redact_pii("just plain words 1.2 not-an-ip 12.34")
    assert (ne, ni, np_) == (0, 0, 0)
    assert "[" not in red


def test_inject_pii_arithmetic():
    assert inject_pii(15, "x").endswith(
        " user15@example.com 10.0.15.15 +1-555-0015"
    )
    assert inject_pii(7, "x").endswith(" alt7@mail.test")  # 7 % 7 == 0


def test_pii_batch_counts():
    out = pii_redact_batch(
        pa.table(
            {
                "doc_id": pa.array([7, 8], pa.int64()),
                "text": pa.array(["a", "b"], pa.string()),
            }
        )
    )
    assert out["n_emails"].to_pylist() == [2, 1]  # doc 7 gets the alt email
    assert out["n_ips"].to_pylist() == [1, 1]
    assert out["n_phones"].to_pylist() == [1, 1]
    assert "@" not in out["redacted"][0].as_py()


def test_repetition_stats_edges():
    assert repetition_stats("") == (0, 0, 0, 0)
    assert repetition_stats("one") == (1, 1, 0, 0)
    # "a b a b a": words 5, distinct 2, bigrams 4, top ('a','b') x2
    assert repetition_stats("a b a b a") == (5, 2, 4, 2)


def test_repetition_gates():
    out = repetition_batch(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    [
                        "spam spam spam spam spam",
                        # 30 distinct words: top bigram frac 1/29 ~ 0.034
                        " ".join(f"w{i}" for i in range(30)),
                    ],
                    pa.string(),
                ),
            }
        )
    )
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["dup_word_frac"] == 4 / 5
    assert rows[1]["top_bigram_frac"] == 1.0
    assert rows[1]["keep"] is False  # bigram gate trips
    assert rows[2]["dup_word_frac"] == 0.0
    assert rows[2]["keep"] is True


def test_stratified_sample_rates_and_determinism(sf_dir):
    import pyarrow.parquet as pq

    from pdf_to_text_ray.pipelines.queries import QUERIES

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pylist()
    by_lang_total = {}
    for r in docs:
        by_lang_total[r["lang"]] = by_lang_total.get(r["lang"], 0) + 1

    rows_a = QUERIES["stratified_sample"](sf_dir).take_all()
    rows_b = QUERIES["stratified_sample"](sf_dir).take_all()
    a = sorted(r["doc_id"] for r in rows_a)
    b = sorted(r["doc_id"] for r in rows_b)
    assert a == b  # deterministic

    kept = {r["doc_id"]: r["lang"] for r in rows_a}
    by_lang_kept = {}
    for lang in kept.values():
        by_lang_kept[lang] = by_lang_kept.get(lang, 0) + 1
    # non-en strata are kept whole; en is roughly halved
    for lang, n in by_lang_total.items():
        if lang == "en":
            assert 0.3 * n < by_lang_kept[lang] < 0.7 * n
        else:
            assert by_lang_kept[lang] == n


# ------------------------------------------------- decontamination

def test_probe_of_edges():
    from pdf_to_text_ray.stages.corpus import PROBE_WORDS, probe_of

    words = [f"w{i}" for i in range(PROBE_WORDS)]
    assert probe_of(" ".join(words)) == " ".join(words)
    assert probe_of(" ".join(words[:-1])) is None  # too short
    assert probe_of("") is None
    # extra words beyond the probe are ignored
    assert probe_of(" ".join(words + ["extra"])) == " ".join(words)


def test_contamination_scanner_hits_and_counts():
    import ray

    from pdf_to_text_ray.stages.corpus import make_contamination_scanner

    probes = ["alpha beta gamma", "delta epsilon zeta"]
    scan = make_contamination_scanner(ray.put(probes))
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "clean document",
                    "contains alpha beta gamma inline",
                    "both: alpha beta gamma and delta epsilon zeta",
                    "partial alpha beta only",
                ],
                pa.string(),
            ),
        }
    )
    out = {r["doc_id"]: r["n_hits"] for r in scan(batch).to_pylist()}
    assert out == {2: 1, 3: 2}


def test_decontaminate_flags_benchmark_docs(sf_dir):
    """Every benchmark doc long enough to yield a probe must flag
    itself (it trivially contains its own probe)."""
    import pyarrow.parquet as pq

    from pdf_to_text_ray.pipelines.queries import QUERIES
    from pdf_to_text_ray.stages.corpus import (
        PROBE_MOD,
        probe_of,
    )

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    bench_ids = {
        d["doc_id"]
        for d in docs
        if d["doc_id"] % PROBE_MOD == 0 and probe_of(d["text"]) is not None
    }
    flagged = {
        r["doc_id"] for r in QUERIES["decontaminate"](sf_dir).take_all()
    }
    assert bench_ids <= flagged


# ------------------------------------------------- sequence packing

def test_pack_sequences_matches_naive_cumsum(sf_dir):
    """Distributed two-level scan == single-process pandas cumsum,
    bit for bit, under a chunk size that forces multi-chunk scans."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from pdf_to_text_ray.stages.packing import pack_sequences

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    got = (
        pack_sequences(docs, budget=64, chunk_docs=37)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    df = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pandas()
    df["n_tokens"] = df["text"].str.count(r"\S+")
    df = df.sort_values(["lang", "doc_id"])
    df["start_tok"] = (
        df.groupby("lang")["n_tokens"].cumsum() - df["n_tokens"]
    )
    df["bin_id"] = df["start_tok"] // 64
    last = (df["start_tok"] + df["n_tokens"] - 1) // 64
    df["n_bins"] = (last - df["bin_id"] + 1).where(df["n_tokens"] > 0, 1)
    exp = (
        df[["doc_id", "lang", "n_tokens", "start_tok", "bin_id", "n_bins"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in got.columns if c != "lang"}),
        exp.astype({c: "int64" for c in exp.columns if c != "lang"}),
    )


def test_pack_sequences_distributed_offsets_bit_identical(sf_dir):
    """Forcing the beyond-budget regime (offsets_budget_bytes=1 sends
    EVERY corpus through _pack_distributed, with SUPER_CHUNKS shrunk so
    the superchunk scan is genuinely multi-level) must produce
    bit-identical bins to the broadcast-offsets fast path."""
    import pandas as pd
    import ray.data

    from pdf_to_text_ray.stages import packing

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    fast = (
        packing.pack_sequences(docs, budget=64, chunk_docs=37)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    orig_super = packing.SUPER_CHUNKS
    packing.SUPER_CHUNKS = 3  # several chunks per superchunk
    try:
        slow = (
            packing.pack_sequences(
                docs, budget=64, chunk_docs=37, offsets_budget_bytes=1
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    finally:
        packing.SUPER_CHUNKS = orig_super
    pd.testing.assert_frame_equal(
        fast.astype({c: "int64" for c in fast.columns if c != "lang"}),
        slow[fast.columns].astype(
            {c: "int64" for c in slow.columns if c != "lang"}
        ),
    )


def test_pack_bins_are_budget_dense(sf_dir):
    """Concat-then-chunk invariant: within a lang stream every bin
    except the last starts exactly at a budget boundary — the doc
    start offsets tile the token stream with no gaps."""
    import ray.data

    from pdf_to_text_ray.stages.packing import pack_sequences

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    rows = pack_sequences(docs, budget=64, chunk_docs=37).take_all()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["doc_id"])
        run = 0
        for r in rs:
            assert r["start_tok"] == run, (lang, r)
            run += r["n_tokens"]


# ------------------------------------------- temperature resampling

def test_mix_thresholds_exact_integer_math():
    from pdf_to_text_ray.stages.corpus import MIX_MOD, mix_thresholds

    counts = {"en": 400, "fr": 64, "de": 4}
    thr = mix_thresholds(counts, target_total=234)
    # w = {20, 8, 2}, W = 30
    assert thr["en"] == min(MIX_MOD, (MIX_MOD * 234 * 20) // (30 * 400))
    assert thr["de"] == min(MIX_MOD, (MIX_MOD * 234 * 2) // (30 * 4))
    # tail keeps a larger fraction than the head (the whole point)
    assert thr["de"] > thr["en"]
    # a tiny stratum saturates at keep-everything
    assert mix_thresholds({"en": 10**6, "xx": 1}, 10**5)["xx"] == MIX_MOD


def test_temperature_mix_flattens_distribution(sf_dir):
    import pyarrow.parquet as pq

    from pdf_to_text_ray.pipelines.queries import QUERIES

    orig = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["lang"])
        .to_pandas()["lang"]
        .value_counts()
    )
    kept = {}
    for r in QUERIES["temperature_mix"](sf_dir).take_all():
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
    # every language survives, and the kept fraction of the most
    # common language is below the kept fraction of the rarest
    assert set(kept) == set(orig.index)
    head, tail = orig.index[0], orig.index[-1]
    assert kept[head] / orig[head] < kept[tail] / orig[tail]


# ------------------------------------------- crawl snapshot delta

def test_crawl_delta_classes(sf_dir):
    from pdf_to_text_ray.pipelines.queries import QUERIES
    from pdf_to_text_ray.sources.synth import url_for

    rows = {r["url"]: r for r in QUERIES["crawl_delta"](sf_dir).take_all()}
    statuses = {r["status"] for r in rows.values()}
    assert statuses <= {"added", "updated", "unchanged"}
    # every re-crawled url (doc_id % 10 == 2: one crawl at ts, one a
    # day earlier) must be 'updated' — its crawls straddle the
    # midpoint boundary by construction
    for url, r in rows.items():
        doc_id = int(url.rsplit("/", 1)[1])
        if doc_id % 10 == 2:
            assert r["status"] == "updated", (url, r)
            assert r["n_old"] == 1 and r["n_new"] == 1
        else:
            assert r["n_old"] + r["n_new"] == 1


def test_chunk_offsets_merges_split_partials():
    """A (lang, chunk) key arriving as multiple per-block partials must
    merge before the exclusive scan (blocks can split a scan chunk)."""
    from pdf_to_text_ray.stages.packing import chunk_offsets

    rows = [
        {"lang": "en", "chunk": 0, "chunk_tokens": 10},
        {"lang": "en", "chunk": 0, "chunk_tokens": 5},   # same key, block 2
        {"lang": "en", "chunk": 1, "chunk_tokens": 7},
        {"lang": "fr", "chunk": 0, "chunk_tokens": 3},
    ]
    off = chunk_offsets(rows)
    assert off == {("en", 0): 0, ("en", 1): 15, ("fr", 0): 0}


def test_pack_sequences_parallelism_invariant(sf_dir):
    """Identical output under 1-block and many-block reads (scan chunks
    split across blocks exercise the partial-merge path)."""
    import ray.data

    from pdf_to_text_ray.stages.packing import pack_sequences

    def run(num_blocks):
        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "lang", "text"],
            override_num_blocks=num_blocks,
        )
        return sorted(
            (
                tuple(r[k] for k in ("doc_id", "lang", "n_tokens",
                                     "start_tok", "bin_id", "n_bins"))
                for r in pack_sequences(ds, budget=64, chunk_docs=37)
                .take_all()
            )
        )

    assert run(1) == run(13)


# ------------------------------------------- boilerplate-line removal

def test_boilerplate_droplist_regimes_identical(sf_dir):
    """Driver-merge and distributed-groupby merges produce the same
    droplist (byte_budget=0 forces the shuffled path)."""
    import ray.data

    from pdf_to_text_ray.stages.corpus import boilerplate_droplist

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    fast = boilerplate_droplist(ds)
    slow = boilerplate_droplist(ds, byte_budget=0)
    assert fast == slow
    assert len(fast) > 0  # the sf corpus does repeat lines across docs


def test_boilerplate_filter_semantics():
    """No copy of a repeated line survives; unique lines unharmed."""
    import pyarrow as pa
    import ray
    import ray.data

    from pdf_to_text_ray.stages.corpus import (
        boilerplate_droplist,
        make_boiler_filter,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        shared + " one two three four five six seven eight nine ten",
        shared + " uno dos tres cuatro cinco seis siete ocho nueve diez",
        "only unique words here nothing repeated across any other doc x",
    ]
    t = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    ds = ray.data.from_arrow(t)
    drop = boilerplate_droplist(ds)
    out = (
        ds.map_batches(make_boiler_filter(ray.put(drop)),
                       batch_format="pyarrow")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["n_removed"].tolist() == [1, 1, 0]
    assert shared not in out["clean_text"][0]
    assert shared not in out["clean_text"][1]
    assert out["clean_text"][2] == docs[2]
