"""The bloom-horizon audit's twin IS its instrumentation (VERDICT r12
#4): BLOOM_HORIZON.json's false-drop measurement is only as good as
the batch-aware python twin in tools/bloom_horizon.py agreeing with
the real kernel. This pins tool-twin ≡ kernel at small scale, batch
boundaries and per-batch escrow eviction included, so a kernel change
that silently diverges from the twin fails CI instead of producing a
wrong artifact on the next regeneration.
"""

from __future__ import annotations

import hashlib
import sys
from collections import defaultdict
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from bloom_horizon import gen_corpus, twin_replay  # noqa: E402

from eventstream_notify_spark.streaming.dedup import (  # noqa: E402
    BLOOM_SHARDS,
    ESCROW_CAP,
    make_bounded_exact_fn,
)


class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def _kernel_replay(files, escrow_cap):
    """Feed the corpus through the REAL kernel function, one
    (shard, batch) group at a time — the same grouping
    applyInPandasWithState produces."""
    fn = make_bounded_exact_fn(escrow_cap)
    states: dict[int, _FakeState] = defaultdict(_FakeState)
    out = {}
    for batch in files:
        per_shard = defaultdict(lambda: ([], []))
        for doc_id, text in batch:
            h = hashlib.sha256(text.encode()).hexdigest()
            ids, hs = per_shard[int(h[:4], 16) % BLOOM_SHARDS]
            ids.append(doc_id)
            hs.append(h)
        for shard, (ids, hs) in per_shard.items():
            pdf = pd.DataFrame({"doc_id": ids, "h": hs})
            for res in fn((shard,), iter([pdf]), states[shard]):
                for r in res.itertuples():
                    out[int(r.doc_id)] = (
                        None if pd.isna(r.canonical_id) else int(r.canonical_id),
                        bool(r.is_dup),
                        bool(r.exact),
                    )
    return out


def test_tool_twin_matches_kernel_across_batches():
    files = gen_corpus(2_000)
    twin, false_drops, novel, repeats, seg_counts = twin_replay(files)
    kernel = _kernel_replay(files, ESCROW_CAP)
    assert kernel == twin
    assert novel == 2_000
    assert repeats == sum(len(f) for f in files) - 2_000 > 0
    # at 2k distinct (~31/shard) nothing overflows segment 0 and no
    # bloom FP is plausible at these occupancies
    assert false_drops == 0
    assert set(seg_counts) == {1}


def test_tool_twin_matches_kernel_under_escrow_eviction():
    """Tiny escrow cap forces per-batch FIFO eviction, the timing the
    batch-aware twin exists to replicate: a dup of an evicted content
    must resolve bloom-only (canonical null, exact=false) in BOTH."""
    files = gen_corpus(1_000)
    import bloom_horizon as bh

    orig = bh.ESCROW_CAP
    bh.ESCROW_CAP = 4
    try:
        twin, _, _, _, _ = bh.twin_replay(files)
    finally:
        bh.ESCROW_CAP = orig
    kernel = _kernel_replay(files, 4)
    assert kernel == twin
    # the tiny cap must actually exercise the bloom-only path
    assert any(v == (None, True, False) for v in twin.values())
