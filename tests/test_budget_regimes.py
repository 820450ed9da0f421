"""Scale tests: the MinHash verification budget gates must trip on
REAL volume (round-3 verdict task #7) — not via budget override.

``minhash_near_dups`` picks its verification regime by measured size:
candidate-pair ids beyond ``PAIR_ID_BUDGET_BYTES`` (256 MiB) -> full
partitioned join; candidate texts beyond ``VERIFY_TEXT_BUDGET_BYTES``
(256 MiB) -> filtered join. The small-corpus equality test
(tests/test_training_ops.py::test_minhash_verify_regimes_identical)
pins the three regimes identical by FORCING them with budget=0; these
two tests instead synthesize amplified corpora whose natural byte
volume exceeds the DEFAULT budgets, and assert (a) the gate fired —
via the ``regime_hook`` diagnostic — and (b) the fallback produced the
exact analytically-known pair set while carrying hundreds of MB.

Corpora are generated deterministically INSIDE map tasks from doc_id
(never on the driver), mirroring how a 100-TB corpus would arrive as
blocks, so the test also exercises block-parallel generation.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from pdf_to_text_ray.stages import dedup


def _amplified_corpus(n_docs: int, rep: int, n_toks: int, tok_len: int):
    """doc_id 0..n_docs-1; docs with the same ``doc_id // rep`` carry
    IDENTICAL text (exact duplicates -> all 16 LSH bands collide):
    ``n_toks`` random tokens of ``tok_len`` chars, seeded by group id,
    so replicas generated in different map tasks agree byte-for-byte
    while distinct groups share ~0 shingles (cross-group Jaccard far
    below 0.8). The generator lives INSIDE the closure (pickled by
    value — the test module isn't importable on workers)."""

    def expand(batch: pa.Table) -> pa.Table:
        import numpy as np

        letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)

        def gen_text(group: int) -> str:
            rng = np.random.RandomState(group + 1)
            toks = letters[rng.randint(0, 26, size=(n_toks, tok_len))]
            return " ".join(bytes(t).decode() for t in toks)

        ids = batch["id"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([gen_text(int(i) // rep) for i in ids]),
            }
        )

    return ray.data.range(n_docs, override_num_blocks=32).map_batches(
        expand, batch_format="pyarrow"
    )


@pytest.mark.scale
def test_pair_budget_trips_full_join_regime():
    """64 groups x 184 exact replicas -> 64*C(184,2)*16 bands ~= 17.2M
    raw band-duplicated pair rows ~= 276 MB > PAIR_ID_BUDGET_BYTES: the
    full-join regime must fire NATURALLY and verify every intra-group
    pair at jaccard == 1.0."""
    groups, rep = 64, 184
    ds = _amplified_corpus(groups * rep, rep, n_toks=60, tok_len=5)

    regimes = []
    out = dedup.minhash_near_dups(ds, regime_hook=regimes.append)
    counts = (
        out.map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array([t.num_rows], pa.int64()),
                    "ok": pa.array(
                        [
                            int(
                                pa.compute.all(
                                    pa.compute.equal(t["jaccard"], 1.0)
                                ).as_py()
                                if t.num_rows
                                else 1
                            )
                        ],
                        pa.int64(),
                    ),
                    "same_group": pa.array(
                        [
                            int(
                                all(
                                    a // rep == b // rep
                                    for a, b in zip(
                                        t["doc_a"].to_pylist(),
                                        t["doc_b"].to_pylist(),
                                    )
                                )
                            )
                        ],
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    assert regimes == ["full_join"], (
        "pair-id volume was expected to exceed the 256 MiB budget "
        f"naturally; regime taken: {regimes}"
    )
    assert sum(r["n"] for r in counts) == groups * rep * (rep - 1) // 2
    assert all(r["ok"] for r in counts)
    assert all(r["same_group"] for r in counts)


@pytest.mark.scale
def test_text_budget_trips_filtered_join_regime():
    """110 groups x 2 exact replicas of ~1.3 MB docs -> 220 candidate
    texts ~= 286 MB > VERIFY_TEXT_BUDGET_BYTES (pair ids stay tiny):
    the filtered-join regime must fire NATURALLY and verify exactly the
    110 intra-group pairs at jaccard == 1.0."""
    groups, rep = 110, 2
    # ~1.3 MB docs of 260 HUGE (5000-char) tokens: big bytes, tiny
    # shingle count — 220 candidate docs exceed the 256 MiB text budget
    # while signatures stay cheap to compute.
    ds = _amplified_corpus(groups * rep, rep, n_toks=260, tok_len=5000)

    regimes = []
    out = dedup.minhash_near_dups(ds, regime_hook=regimes.append)
    rows = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"]) for r in out.take_all()
    )
    assert regimes == ["filtered_join"], (
        "candidate-text volume was expected to exceed the 256 MiB "
        f"budget naturally; regime taken: {regimes}"
    )
    assert rows == [
        (g * rep, g * rep + 1, 1.0) for g in range(groups)
    ]
