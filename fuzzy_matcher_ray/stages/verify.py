"""Precise verification of candidate pairs.

≙ reference verify+score (``fuzzy_matcher_core.go:220-267``
CalculateSimilarity per field + threshold reject + weighted sum), re-expressed
as a batched numeric kernel over pair tables: exact 5-gram Jaccard for the
near-dup pipeline, suffix-array longest-common-substring for the substring
pass. Texts are attached by broadcast lookup or hash join
(``stages/joins.py``) — the per-batch kernel itself is pure numpy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fuzzy_matcher_ray.config import PipelineConfig
from fuzzy_matcher_ray.functions.shingle import (
    _scratch_buf, counts_to_offsets, segmented_intersection_counts,
    shingle_batch, unique_per_doc)
from fuzzy_matcher_ray.functions.suffix import lcp_array, suffix_array
from fuzzy_matcher_ray.stages.joins import attach_columns

# docs per shingling chunk inside the verifiers: keeps every transient
# buffer (rolling-hash scratch, gather output, per-chunk unique sets) under
# ~10 MB so glibc serves them from the reusable heap instead of fresh mmaps
# — this VM charges ~50x for first-touch of large fresh mappings, which
# made whole-batch shingling (3×85 MB per 4096-pair batch) cost seconds.
_SHINGLE_CHUNK_DOCS = 512


def _chunked_unique_sets(uniq_texts: pa.Array, k: int, seed: int
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc sorted-unique shingle sets of ``uniq_texts``, computed in
    doc chunks with a pooled destination buffer (no >10 MB fresh
    allocation anywhere). Returns (uh view into the pool, uc)."""
    n = len(uniq_texts)
    uc = np.empty(n, dtype=np.int64)
    # unique hashes per doc <= chars per doc ⇒ total text bytes is a bound
    bound = max(int(uniq_texts.nbytes), 1)
    dest = _scratch_buf("jaccard_uh", bound)
    pos = 0
    for lo in range(0, n, _SHINGLE_CHUNK_DOCS):
        sl = uniq_texts.slice(lo, min(_SHINGLE_CHUNK_DOCS, n - lo))
        h, c = shingle_batch(sl, k, seed)
        uh_c, uc_c = unique_per_doc(h, c)
        dest[pos: pos + len(uh_c)] = uh_c
        uc[lo: lo + len(c)] = uc_c
        pos += len(uh_c)
    return dest[:pos], uc


def attach_pair_texts(pairs, docs_norm, cfg: PipelineConfig,
                      col: str = "norm_text", attacher=None):
    """pairs (a,b) → (a, b, text_a, text_b).

    Pass a shared ``BroadcastAttacher`` to reuse one collected/broadcast copy
    of the doc texts across every pass of a pipeline run.
    """
    if attacher is not None:
        out = attacher.attach(pairs, "a", {col: "text_a"})
        return attacher.attach(out, "b", {col: "text_b"})
    out = attach_columns(pairs, docs_norm, "a", "doc_id", {col: "text_a"},
                         how="inner", num_partitions=cfg.join_num_partitions)
    out = attach_columns(out, docs_norm, "b", "doc_id", {col: "text_b"},
                         how="inner", num_partitions=cfg.join_num_partitions)
    return out


def _batch_unique_docs(batch: pa.Table, fetched) -> tuple[np.ndarray, pa.Array]:
    """Distinct docs of a pair batch + their texts, each text ONCE.

    Returns (inv, uniq_texts): ``inv`` maps concat([a, b]) positions to the
    unique-doc index; ``uniq_texts[j]`` is the text of unique doc j. Texts
    come from the shared broadcast (``fetched`` = (sorted_keys, texts) — the
    pair table then carries only 16 B/row through the shuffle) or, when
    ``fetched`` is None, from attached text_a/text_b columns.
    """
    a = batch["a"].to_numpy(zero_copy_only=False)
    b = batch["b"].to_numpy(zero_copy_only=False)
    ids_all = np.concatenate([a, b])
    u, first, inv = np.unique(ids_all, return_index=True, return_inverse=True)
    if fetched is not None:
        keys, texts = fetched
        idx = np.searchsorted(keys, u)
        idx = np.clip(idx, 0, max(len(keys) - 1, 0))
        uniq_texts = texts.take(pa.array(idx, pa.int64()))
    else:
        ta, tb = batch["text_a"], batch["text_b"]
        if isinstance(ta, pa.ChunkedArray):
            ta = ta.combine_chunks()
        if isinstance(tb, pa.ChunkedArray):
            tb = tb.combine_chunks()
        uniq_texts = pa.concat_arrays([ta, tb]).take(pa.array(first, pa.int64()))
    return inv, uniq_texts


class _TextFetcher:
    """Lazy per-worker fetch of the broadcast (doc_id → text) table."""

    def __init__(self, text_ref):
        self.text_ref = text_ref
        self._fetched = None

    def fetched(self):
        if self.text_ref is None:
            return None
        if self._fetched is None:
            import ray
            keys, values = ray.get(self.text_ref)   # zero-copy from plasma
            (col,) = values.values()
            self._fetched = (keys, col)
        return self._fetched


def _sets_chunks(tbl: pa.Table):
    """Yield (ids_slice, offsets, values_chunk) per chunk of a sets block,
    with offsets ABSOLUTE into the chunk's full child values array (pyarrow
    list semantics), so no value buffer is ever sliced or copied."""
    ids_t = tbl["doc_id"].to_numpy(zero_copy_only=False)
    col = tbl["sets"]
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    row = 0
    for ch in chunks:
        m = len(ch)
        offs = ch.offsets.to_numpy(zero_copy_only=False)
        yield ids_t[row: row + m], offs, ch
        row += m


def build_shingle_sets(norm, cfg: PipelineConfig, max_bytes: int = 4 << 30):
    """ONE corpus-wide distributed pass computing every doc's sorted-unique
    shingle set. The heavy hash values STAY in the plasma blocks the
    ``map_batches`` tasks produced — the driver assembles only a slim
    routing index (sorted doc_ids → block, start, count; ~28 B/doc) and the
    Jaccard verify stages intersect pairs directly against the zero-copy
    per-block plasma arrays: no per-batch re-shingling, no gathering, and
    no driver-side copy of the multi-GB value buffer (first-touch faults on
    fresh multi-GB mappings cost ~50x on shared VMs; plasma pages are
    already backed and shared across all workers on the node).

    Returns ``(routing_ref, block_refs)`` or None when the artifact would
    exceed ``max_bytes`` (beyond that the per-batch chunked recompute path
    in JaccardVerifier stays — at 100 TB the broadcast is one copy per
    node, so the cap is a per-node memory budget, not a correctness limit).
    """
    import ray

    try:
        est = int(norm.size_bytes()) * 8      # ≤ 8 B/char of unique hashes
    except Exception:
        est = None
    if est is not None and est > max_bytes:
        return None

    def _sets(t: pa.Table) -> pa.Table:
        h, c = shingle_batch(t["norm_text"], cfg.shingle_k, cfg.seed)
        uh, uc = unique_per_doc(h, c)
        offs = counts_to_offsets(uc)
        return pa.table({
            "doc_id": t["doc_id"],
            "sets": pa.LargeListArray.from_arrays(offs,
                                                  pa.array(uh.view(np.int64))),
        })

    sets_ds = norm.select_columns(["doc_id", "norm_text"]) \
                  .map_batches(_sets, batch_format="pyarrow").materialize()
    block_refs = sets_ds.to_arrow_refs()
    ids_parts, blk_parts, start_parts, cnt_parts = [], [], [], []
    n_chunks = 0
    total_bytes = 0
    for ref in block_refs:
        tbl = ray.get(ref)                    # zero-copy plasma view
        for ids_c, offs, _ch in _sets_chunks(tbl):
            m = len(ids_c)
            if m == 0:
                n_chunks += 1
                continue
            ids_parts.append(ids_c)
            blk_parts.append(np.full(m, n_chunks, dtype=np.int32))
            start_parts.append(offs[:-1])
            cnt_parts.append(np.diff(offs))
            total_bytes += int(offs[-1] - offs[0]) * 8
            n_chunks += 1
            if total_bytes > max_bytes:
                return None                   # bound exceeded — fall back
    if not ids_parts:
        return None
    ids = np.concatenate(ids_parts)
    order = np.argsort(ids, kind="stable")
    routing = (ids[order],
               np.concatenate(blk_parts)[order],
               np.concatenate(start_parts)[order],
               np.concatenate(cnt_parts)[order])
    return ray.put(routing), tuple(block_refs)


def _intersect_block_sets(blocks, blk, starts, counts,
                          ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
    """|set ∩ set| per pair over per-doc sets living in a LIST of zero-copy
    plasma value arrays (doc d's set is blocks[blk[d]][starts[d]:
    starts[d]+counts[d]]). Same small-into-big binary-search kernel as
    :func:`segmented_intersection_counts` — the two sets stay in L1/L2."""
    n = len(ia)
    out = np.zeros(n, dtype=np.int64)
    ss = np.searchsorted
    ia_l, ib_l = ia.tolist(), ib.tolist()
    for p in range(n):
        da, db = ia_l[p], ib_l[p]
        ca, cb = counts[da], counts[db]
        if ca == 0 or cb == 0:
            continue
        if ca > cb:
            da, db, ca, cb = db, da, cb, ca
        sa, sb = starts[da], starts[db]
        small = blocks[blk[da]][sa: sa + ca]
        big = blocks[blk[db]][sb: sb + cb]
        pos = ss(big, small)
        np.minimum(pos, cb - 1, out=pos)
        out[p] = np.count_nonzero(big[pos] == small)
    return out


class JaccardVerifier(_TextFetcher):
    """pairs (a, b[, text_a, text_b]) → (a, b, jaccard) for pairs ≥ threshold.

    Exact Jaccard over unique k-gram shingle sets. Each DISTINCT doc in the
    batch is shingled exactly once (a doc in 50 candidate pairs used to be
    shingled 50× — round-1 verdict item 2); per-pair sets are then gathered
    from the unique pool and intersected via one sort over the concatenated
    (pair_id, hash) rows — no per-pair Python set work. With ``text_ref``
    (the shared broadcast) the input pairs carry no text at all.
    """

    def __init__(self, cfg: PipelineConfig, threshold: float | None = None,
                 text_ref=None, sets_ref=None):
        super().__init__(text_ref)
        self.cfg = cfg
        self.threshold = cfg.jaccard_threshold if threshold is None else threshold
        self.sets_ref = sets_ref
        self._sets = None

    def _sets_artifact(self):
        if self._sets is None:
            import ray
            routing_ref, block_refs = self.sets_ref
            ids, blk, starts, counts = ray.get(routing_ref)
            blocks = []
            for ref in block_refs:              # zero-copy plasma views
                for _ids, _offs, ch in _sets_chunks(ray.get(ref)):
                    blocks.append(
                        ch.values.to_numpy(zero_copy_only=False)
                          .view(np.uint64))
            self._sets = (ids, blk, starts, counts, blocks)
        return self._sets

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        k, seed = self.cfg.shingle_k, self.cfg.seed
        n = len(batch)
        if self.sets_ref is not None:
            # precomputed corpus shingle-set artifact: intersect directly
            # against the zero-copy per-block plasma arrays — no shingling,
            # no gathering, no copies
            ids_sorted, blk, starts, counts, blocks = self._sets_artifact()
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            pa_idx = np.searchsorted(ids_sorted, a)
            pb_idx = np.searchsorted(ids_sorted, b)
            np.clip(pa_idx, 0, max(len(ids_sorted) - 1, 0), out=pa_idx)
            np.clip(pb_idx, 0, max(len(ids_sorted) - 1, 0), out=pb_idx)
            ok_a = ids_sorted[pa_idx] == a
            ok_b = ids_sorted[pb_idx] == b
            ca = np.where(ok_a, counts[pa_idx], 0)
            cb = np.where(ok_b, counts[pb_idx], 0)
            inter = _intersect_block_sets(blocks, blk, starts, counts,
                                          pa_idx, pb_idx)
            inter = np.where(ok_a & ok_b, inter, 0)
            union = ca + cb - inter
        else:
            inv, uniq_texts = _batch_unique_docs(batch, self.fetched())
            uh, uc = _chunked_unique_sets(uniq_texts, k, seed)
            ia, ib = inv[:n], inv[n:]
            ca, cb = uc[ia], uc[ib]
            inter = segmented_intersection_counts(uh, uc, ia, ib)
            union = ca + cb - inter
        both_empty = union == 0
        jac = np.where(both_empty, 1.0,
                       inter / np.maximum(union, 1))
        keep = jac >= self.threshold
        return pa.table({
            "a": pa.array(batch["a"].to_numpy(zero_copy_only=False)[keep]),
            "b": pa.array(batch["b"].to_numpy(zero_copy_only=False)[keep]),
            "jaccard": pa.array(jac[keep]),
        })


def _extend_lr(ta: str, ia: int, tb: str, ib: int, width: int) -> tuple[int, int]:
    """(left, right) extents of the maximal common run around the identical
    seed window ta[ia:ia+width] == tb[ib:ib+width]; run length = left+right.
    Chunked slice compares (C speed)."""
    left = 0
    step = 256
    while True:
        s = min(step, ia - left, ib - left)
        if s <= 0:
            break
        if ta[ia - left - s: ia - left] == tb[ib - left - s: ib - left]:
            left += s
        else:
            while ia - left - 1 >= 0 and ib - left - 1 >= 0 and \
                    ta[ia - left - 1] == tb[ib - left - 1]:
                left += 1
            break
    right = width
    la, lb = len(ta), len(tb)
    while True:
        s = min(step, la - ia - right, lb - ib - right)
        if s <= 0:
            break
        if ta[ia + right: ia + right + s] == tb[ib + right: ib + right + s]:
            right += s
        else:
            while ia + right < la and ib + right < lb and \
                    ta[ia + right] == tb[ib + right]:
                right += 1
            break
    return left, right


def _extend_match(ta: str, ia: int, tb: str, ib: int, width: int) -> int:
    """Run length of the maximal common run around the identical seed."""
    left, right = _extend_lr(ta, ia, tb, ib, width)
    return left + right


class SubstringVerifier(_TextFetcher):
    """pairs (a, b[, text_a, text_b]) → (a, b, common_len) for pairs sharing
    a substring >= min_len.

    Fast path: unpack the shared-fingerprint seed positions (pp = pos_a<<21 |
    pos_b, from the winnow stage), confirm the seed windows are identical and
    extend the run with chunked slice compares — O(match) per pair.
    Fallback (null/overflow pp, seed mismatch from a hash collision): full
    suffix-array + Kasai LCP over the concatenated pair, max cross-document
    LCP == longest common substring (functions/suffix.py).
    """

    def __init__(self, cfg: PipelineConfig, text_ref=None):
        super().__init__(text_ref)
        self.cfg = cfg

    def _sa_common_len(self, ta: str, tb: str) -> int:
        s = np.concatenate([
            np.frombuffer(ta.encode(), dtype=np.uint8).astype(np.int64),
            np.array([256], dtype=np.int64),
            np.frombuffer(tb.encode(), dtype=np.uint8).astype(np.int64)])
        boundary = len(ta.encode())
        sa = suffix_array(s)
        lcp = lcp_array(s, sa)
        side = sa > boundary                # suffix starts in text_b
        cross = np.zeros(len(s), dtype=bool)
        cross[1:] = side[1:] != side[:-1]
        return int(lcp[cross].max()) if cross.any() else 0

    _MAX_TRIES = 2048     # occurrence-pair budget before the SA fallback

    def _pair_common_len(self, ta: str, tb: str, ha: np.ndarray,
                         hb: np.ndarray, probe: int, min_len: int) -> int:
        """Exact >=min_len decision via probe-gram intersection + extension.

        Any common substring of length >= min_len contains a probe-length
        (min_len//2) gram at every offset, so both docs share that gram's
        hash; extending at the correct occurrence pair recovers the run.
        Early exit on success keeps the predicate exact; if the
        occurrence-pair budget runs out before success, the suffix array
        decides (repetitive pathological docs only).
        """
        common = np.intersect1d(ha, hb)
        if len(common) == 0:
            return 0                        # exact reject: no shared gram
        # all matched positions, grouped by gram value — one vectorized pass
        ma = np.nonzero(np.isin(ha, common))[0]
        mb = np.nonzero(np.isin(hb, common))[0]
        oa = ma[np.argsort(ha[ma], kind="stable")]
        ob = mb[np.argsort(hb[mb], kind="stable")]
        va, vb = ha[oa], hb[ob]
        best = 0
        tries = 0
        found: list[tuple[int, int, int]] = []   # (run_start_a, run_end_a, offset)
        ja = jb = 0
        na_, nb_ = len(oa), len(ob)
        while ja < na_ and jb < nb_:
            if va[ja] < vb[jb]:
                ja += 1
                continue
            if va[ja] > vb[jb]:
                jb += 1
                continue
            v = va[ja]
            ja2 = ja
            while ja2 < na_ and va[ja2] == v:
                ja2 += 1
            jb2 = jb
            while jb2 < nb_ and vb[jb2] == v:
                jb2 += 1
            for ia in oa[ja:ja2].tolist():
                for ib in ob[jb:jb2].tolist():
                    d = ib - ia
                    # aligned-run memo: (ia, ib) inside an already-explored
                    # run with the same offset rediscovers it exactly — skip
                    if any(s <= ia < e and d == off for s, e, off in found):
                        continue
                    tries += 1
                    if tries > self._MAX_TRIES:
                        return self._sa_common_len(ta, tb)
                    if ta[ia: ia + probe] != tb[ib: ib + probe]:
                        continue            # 64-bit hash collision
                    left, right = _extend_lr(ta, ia, tb, ib, probe)
                    ext = left + right
                    found.append((ia - left, ia + right, d))
                    if ext > best:
                        best = ext
                        if best >= min_len:
                            return best     # exact for the >= min_len test
            ja, jb = ja2, jb2
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        min_len = cfg.substr_min_len
        probe = max(8, min_len // 2)
        n = len(batch)
        if n == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "common_len": pa.array([], pa.int64())})
        # each DISTINCT doc is materialized + probe-gram-hashed once per
        # batch; per-pair arrays are slices of the unique pool
        inv, uniq_texts = _batch_unique_docs(batch, self.fetched())
        texts = uniq_texts.to_pylist()
        # seed positions from the winnow stage (packed pos_a<<21|pos_b; null
        # ⇒ no usable seed — star/chain pairs, overflow)
        pp = None
        if "pp" in batch.schema.names:
            ppc = batch["pp"].to_numpy(zero_copy_only=False)
            pp = [None if v is None or (isinstance(v, float) and np.isnan(v))
                  else int(v) for v in ppc.tolist()]
        # probe-gram hashes lazily: ONLY docs that reach the fallback path
        # are hashed (the seed fast path resolves the vast majority of pairs
        # with O(match) slice compares)
        uh = uc = uoffs = None
        window = cfg.substr_window
        a_list = batch["a"].to_pylist()
        b_list = batch["b"].to_pylist()
        a_out, b_out, l_out = [], [], []
        for i in range(n):
            ua, ub = inv[i], inv[n + i]
            ta = texts[ua] or ""
            tb = texts[ub] or ""
            if min(len(ta), len(tb)) < min_len:
                continue
            best = -1
            if pp is not None and pp[i] is not None:
                pos_a = pp[i] >> 21
                pos_b = pp[i] & ((1 << 21) - 1)
                # identical-seed check guards against 64-bit fp collisions;
                # extension around the verified seed is exact and O(match)
                if (pos_a + window <= len(ta) and pos_b + window <= len(tb)
                        and ta[pos_a: pos_a + window] == tb[pos_b: pos_b + window]):
                    left, right = _extend_lr(ta, pos_a, tb, pos_b, window)
                    if left + right >= min_len:
                        best = left + right
            if best < min_len:
                # exact fallback: probe-gram intersection + extension (and SA
                # past the tried-pairs budget) decides pairs whose Min-picked
                # seed sits outside the longest shared run
                if uh is None:
                    # chunked, pooled-destination shingling (same rationale
                    # as _chunked_unique_sets; order preserved — positions
                    # in the hash array are char offsets)
                    n_u = len(uniq_texts)
                    uc = np.empty(n_u, dtype=np.int64)
                    dest = _scratch_buf("substr_ph",
                                        max(int(uniq_texts.nbytes), 1))
                    pos = 0
                    for lo in range(0, n_u, _SHINGLE_CHUNK_DOCS):
                        sl = uniq_texts.slice(
                            lo, min(_SHINGLE_CHUNK_DOCS, n_u - lo))
                        h, c = shingle_batch(sl, probe, cfg.seed ^ 0xD1CE)
                        dest[pos: pos + len(h)] = h
                        uc[lo: lo + len(c)] = c
                        pos += len(h)
                    uh = dest[:pos]
                    uoffs = counts_to_offsets(uc)
                best = self._pair_common_len(
                    ta, tb, uh[uoffs[ua]: uoffs[ua + 1]],
                    uh[uoffs[ub]: uoffs[ub + 1]], probe, min_len)
            if best >= min_len:
                a_out.append(a_list[i])
                b_out.append(b_list[i])
                l_out.append(int(best))
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64()),
                         "common_len": pa.array(l_out, pa.int64())})


def simhash_pair_filter(max_hamming: int):
    """Inline pair filter for SimHash candidates (runs before dedup shuffle)."""
    import numpy as np

    from fuzzy_matcher_ray.functions.simhash import hamming64

    def _f(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        d = hamming64(t["simhash_a"].to_numpy(zero_copy_only=False).view(np.uint64),
                      t["simhash_b"].to_numpy(zero_copy_only=False).view(np.uint64))
        return t.filter(pa.array(d <= max_hamming))
    return _f
