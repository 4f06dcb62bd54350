"""Payload verification: vectorized decode + PSNR + caption/phash checks.

Per BASELINE.json input_hint: every fetched row's image bytes must decode to
pixels that match the reference pixels (PSNR >= 40 dB for lossy formats,
exact for lossless), captions must be byte-exact, phash must match.

Two APIs over ONE kernel:

 * ``verify_fetched`` — per-row verdicts (the sink/test API): every input
   row comes back with (psnr_db, psnr_ok, caption_ok, phash_ok).
 * ``verify_stats`` — the aggregate form the engine's lineage counters (and
   the 10^10-row regime) actually need: the kernel folds each Arrow batch to
   ONE count row, so the Python->JVM return path ships ~batch_count rows
   instead of the full row set, and everything checkable in codegen stays
   JVM-side (k parsed from image_id; byte-exact caption equality against a
   SQL twin of the expected-caption formula). Only (k, bytes, phash,
   caption_ok) cross the process boundary — measured, the string columns and
   the per-row return path were ~40% of the round's IPC cost and its worst
   scaling component.

The kernel runs as ``mapInArrow`` — one step lower than ``mapInPandas``: the
Arrow RecordBatch's buffers are viewed DIRECTLY as numpy arrays (payload
bytes = one zero-copy (n, payload_len) reshape when every row is well-sized;
ids and captions go through C++ dictionary-encoding so per-string Python
work is O(unique images), not O(rows)). The pandas path materialized ~3
Python objects per row plus two 10k-iteration Python loops per batch — at
8M rows that allocation churn was the dominant cost of the whole crawl round
AND its scaling limiter (malloc/GC contention grows with cores). Per-row
Python survives only on the malformed-payload fallback.

Ground truth is REGENERATED on the executors from the deterministic corpus
seed (datagen.make_corpus layout: image k <- default_rng(seed*1_000_003+k)),
so no reference pixels are shipped — the check is a true end-to-end payload
integrity gate over the fetch/store path (Arrow + parquet binary handling).
The codec itself is the container-safe stub in codec.py; the PSNR math and
the 40 dB gate are real (jpg lands ~46 dB, png at +inf).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import codec

PSNR_MIN_DB = 40.0
PSNR_EXACT = 999.0  # stand-in for +inf (lossless exact match)

VERIFY_SCHEMA = (
    "round int, url_id long, image_id string, fmt string, "
    "psnr_db double, psnr_ok boolean, caption_ok boolean, phash_ok boolean"
)

STATS_SCHEMA = "n long, n_psnr_ok long, n_caption_ok long, n_phash_ok long, n_ok long"

_HDR = codec._HDR.size
_TILE = 2048  # compute-tile rows: temps stay cache-resident (~6 MB scratch)


def _expected_caption(k: int) -> str:
    return f"caption for image {k}: {'lorem ipsum ' * (k % 4 + 1)}".strip()


def _expected_caption_sql(k_col: str) -> str:
    """JVM codegen twin of ``_expected_caption`` (python % and Spark pmod
    agree on negatives; the literal starts non-blank so strip == rtrim)."""
    return (
        f"rtrim(concat('caption for image ', cast({k_col} as string), ': ', "
        f"repeat('lorem ipsum ', cast(pmod({k_col}, 4) + 1 as int))))"
    )


def _phash_batch(px: np.ndarray, g16_buf: np.ndarray | None = None) -> np.ndarray:
    """Vectorized codec.phash64 over a (n, h, w, 3) batch (h, w divisible by
    8 on this path). Bit-identical to the scalar version by construction:
    both use the integer form 64*block_sum > total_sum (codec.phash64 doc).
    All-integer — no float64 gray plane. ``g16_buf`` optionally supplies a
    preallocated (>=n, h, w) int16 scratch so tiled callers reuse one
    cache-resident buffer instead of mallocing 512 B/row per call."""
    n, h, w, _ = px.shape
    g16 = g16_buf[:n] if g16_buf is not None else np.empty((n, h, w), np.int16)
    np.add(px[..., 0], px[..., 1], out=g16, dtype=np.int16)
    g16 += px[..., 2]
    bh, bw = h // 8, w // 8
    bsum = g16.reshape(n, 8, bh, 8, bw).sum(axis=(2, 4), dtype=np.int64)
    bits = bsum * 64 > bsum.sum(axis=(1, 2))[:, None, None]
    packed = np.packbits(bits.reshape(n, 64).astype(np.uint8), axis=1)
    vals = packed.view(">u8")[:, 0].astype(np.uint64)
    return vals.view(np.int64)


def _varbin_views(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """(offsets int64, data uint8, valid bool|None) zero-copy views of an
    Arrow (large_)binary/(large_)string array, offset-corrected for slices."""
    import pyarrow as pa

    off_dtype = (
        np.int64
        if pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type)
        else np.int32
    )
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    valid = None
    if arr.null_count:
        bits = np.unpackbits(
            np.frombuffer(bufs[0], np.uint8), bitorder="little"
        )
        valid = bits[arr.offset : arr.offset + len(arr)].astype(bool)
    return off.astype(np.int64, copy=False), data, valid


def _prefetch(it: Iterator, depth: int = 2) -> Iterator:
    """Double-buffer an Arrow batch iterator: a daemon thread pulls the next
    batches off the JVM socket (GIL released during socket reads/memcpy)
    while the caller's numpy kernel computes the current one — per-task wall
    becomes ~max(transfer, compute) instead of their sum. Exceptions from
    the source iterator re-raise at the consumption point."""
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()  # consumer gone: unblock the pump so it exits

    def put(x) -> bool:
        while not stop.is_set():
            try:
                q.put(x, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def pump() -> None:
        try:
            for x in it:
                if not put(x):
                    return
            put(_END)
        except BaseException as e:  # noqa: BLE001 — relayed to consumer
            put(e)

    threading.Thread(target=pump, daemon=True).start()
    try:
        while True:
            x = q.get()
            if x is _END:
                return
            if isinstance(x, BaseException):
                raise x
            yield x
    finally:
        # Reached on normal end, consumer error, or GeneratorExit when the
        # task abandons the iterator early (kill / limit / downstream error);
        # without it the pump blocks forever on a full queue and leaks the
        # thread plus up to `depth` pinned Arrow batches.
        stop.set()


def parse_k(s) -> int:
    """image_id 'img<digits>' -> k; -1 otherwise. Digits-only and bounded to
    18 digits (always < 2^63) by design so the Python parse and the JVM twin
    (rlike '^img[0-9]{1,18}$' + try_cast in ``stats_input``) agree on every
    input — an unbounded digit run would overflow np.int64 here while the
    JVM's try_cast maps it to -1."""
    return (
        int(s[3:])
        if isinstance(s, str)
        and s.startswith("img")
        and 1 <= len(s) - 3 <= 18
        and s[3:].isascii()  # isdigit() alone admits Unicode digits the
        and s[3:].isdigit()  # JVM's [0-9] rejects (and int('²') raises)
        else -1
    )


def _make_kernel(corpus_seed: int, side: int):
    """Executor-side batch kernel shared by both verify APIs.

    Returns ``run(ks, bytes_arr, phashes, caption_arr=None, caption_pre=None)
    -> (psnr_db, psnr_ok, caption_ok, phash_ok)`` where ``caption_arr`` is an
    Arrow string array (byte-exact check happens here, via dictionary
    reverse-mapping) XOR ``caption_pre`` is a bool ndarray of JVM-computed
    caption verdicts (verify_stats pre-projection)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    payload_len = _HDR + side * side * 3

    # executor-lifetime ground-truth cache, regenerated per image k
    orig_cache: dict[int, np.ndarray] = {}
    cap_cache: dict[int, str] = {}

    def _orig(k: int) -> np.ndarray:
        if k not in orig_cache:
            r = np.random.default_rng(corpus_seed * 1_000_003 + k)
            orig_cache[k] = r.integers(0, 256, size=(side, side, 3), dtype=np.uint8)
            cap_cache[k] = _expected_caption(k)
        return orig_cache[k]

    def _slow_row(blob: bytes, k: int, caption: str | None, phash: int):
        """Fallback for malformed/odd-shaped payloads. ``caption`` None means
        the caption verdict was precomputed (stats mode) — returned as None.
        The caption verdict is independent of whether the payload decodes
        (same semantics as the JVM pre-projection check)."""
        cap_ok = None
        if caption is not None:
            _orig(k)  # populate cap_cache[k]
            cap_ok = caption == cap_cache[k]
        try:
            orig = _orig(k)
            px, fmt = codec.decode(blob)
            p = codec.psnr(orig, px)
            lossless = fmt == "png"
            db = PSNR_EXACT if np.isinf(p) else p
            ok = np.array_equal(orig, px) if lossless else p >= PSNR_MIN_DB
            return db, ok, cap_ok, phash == codec.phash64(px)
        except Exception:
            return 0.0, False, cap_ok, False

    magic = np.frombuffer(codec.MAGIC, np.uint8)
    # worker-lifetime scratch, reused across tiles and batches
    d_buf = np.empty((_TILE, side, side, 3), np.int16)
    g16_buf = np.empty((_TILE, side, side), np.int16)

    def run(ks, bytes_arr, phashes, caption_arr=None, caption_pre=None):
        n = len(ks)

        # -- payload: zero-copy buffer views, vectorized well-formedness
        off, data, bvalid = _varbin_views(bytes_arr)
        lens = np.diff(off)
        fast = (ks >= 0) & (lens == payload_len)
        if bvalid is not None:
            fast &= bvalid
        if side < 8 or side % 8 != 0:
            fast[:] = False  # vectorized phash needs 8x8 blocks
        starts = off[:-1]

        # Arrow packs values back-to-back, so when EVERY row is well-sized
        # the whole data buffer IS an (n, payload_len) matrix: one zero-copy
        # reshape, no index arrays, no gather (the gather's int64 indices
        # alone were 8x the payload bytes in DRAM traffic per row)
        uniform = n > 0 and bool((lens == payload_len).all())
        view2d = None
        if uniform:
            view2d = data[off[0] : off[-1]].reshape(n, payload_len)
            fast &= (view2d[:, :4] == magic).all(axis=1)
        elif fast.any():
            hdr4 = data[(starts[fast, None] + np.arange(4)).ravel()].reshape(-1, 4)
            fast[np.nonzero(fast)[0][~(hdr4 == magic).all(axis=1)]] = False

        psnr_db = np.zeros(n)
        psnr_ok = np.zeros(n, dtype=bool)
        caption_ok = (
            caption_pre.copy() if caption_pre is not None else np.zeros(n, dtype=bool)
        )
        phash_ok = np.zeros(n, dtype=bool)

        idx = np.nonzero(fast)[0]
        if len(idx):
            kf = ks[idx]
            # ground truth gathered through unique-k indexing (the corpus is
            # orders of magnitude smaller than the batch)
            uk, inv = np.unique(kf, return_inverse=True)
            bank = np.stack([_orig(int(k)) for k in uk])
            if view2d is None:
                # mixed batch: gather only the well-formed rows
                body_ix = (starts[idx, None] + np.arange(payload_len)).ravel()
                rows2d = data[body_ix].reshape(len(idx), payload_len)
            elif len(idx) == n:
                rows2d = view2d  # common case: pure view, zero copies
            else:
                rows2d = view2d[idx]
            # fmt from the header bytes (4:7, space-padded), vectorized
            is_png = (rows2d[:, 4:7] == np.frombuffer(b"png", np.uint8)).all(axis=1)
            px_rows = rows2d[:, _HDR:]

            # tiled compute over preallocated scratch: the int16 diff and
            # phash temps stay cache-resident and are written in place.
            # Per-call mallocs + the float64 gray plane were the scaling
            # limiter at 16-32 concurrent workers (this exact kernel
            # measured 0.42 -> 0.91 efficiency at 4 -> 16 procs after
            # tiling + in-place scratch + integer phash).
            m_all = len(idx)
            for ts in range(0, m_all, _TILE):
                te = min(ts + _TILE, m_all)
                m = te - ts
                ti = idx[ts:te]
                px = px_rows[ts:te].reshape(m, side, side, 3)
                orig = bank[inv[ts:te]]
                d = d_buf[:m]
                # int64-accumulated einsum: one int16 diff temp, no float
                # casts or squared copies
                np.subtract(orig, px, out=d, dtype=np.int16)
                mse = (
                    np.einsum("nhwc,nhwc->n", d, d, dtype=np.int64).astype(np.float64)
                    / (side * side * 3)
                )
                with np.errstate(divide="ignore"):
                    db = 10.0 * np.log10((255.0 * 255.0) / mse)
                exact = mse == 0.0
                psnr_db[ti] = np.where(exact, PSNR_EXACT, db)
                psnr_ok[ti] = np.where(is_png[ts:te], exact, db >= PSNR_MIN_DB)
                phash_ok[ti] = phashes[ti] == _phash_batch(px, g16_buf)

            if caption_arr is not None:
                # captions: dictionary-encoded — expected captions are
                # unique per image k, so a row's caption is right iff its
                # dict entry REVERSE-MAPS to the row's own k. String work is
                # one dict lookup per unique caption, zero per row.
                cap_enc = pc.dictionary_encode(caption_arr)
                cap_idx = cap_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                cap_null = cap_enc.indices.is_null().to_numpy(zero_copy_only=False)
                dict_caps = cap_enc.dictionary.to_pylist()
                k_by_cap = {cap_cache[int(k)]: int(k) for k in uk}
                k_of_cap = np.array(
                    [k_by_cap.get(cs, -2) for cs in dict_caps] or [-2], dtype=np.int64
                )
                caption_ok[idx] = np.where(
                    cap_null[idx],
                    False,
                    k_of_cap[np.where(cap_null, 0, cap_idx)[idx]] == kf,
                )

        slow = np.nonzero(~fast)[0]
        if len(slow):
            # Python objects materialize ONLY for malformed rows
            take = pa.array(slow, pa.int64())
            blobs = pc.take(bytes_arr, take).to_pylist()
            caps = (
                pc.take(caption_arr, take).to_pylist()
                if caption_arr is not None
                else [None] * len(slow)
            )
            for j, i in enumerate(slow):
                cap_j = caps[j] if caption_arr is None or caps[j] is not None else ""
                db_i, ps_i, cap_i, ph_i = _slow_row(
                    blobs[j] if blobs[j] is not None else b"",
                    int(ks[i]),
                    cap_j,
                    int(phashes[i]),
                )
                psnr_db[i], psnr_ok[i], phash_ok[i] = db_i, ps_i, ph_i
                if cap_i is not None:
                    caption_ok[i] = cap_i

        return psnr_db, psnr_ok, caption_ok, phash_ok

    return run


def verify_fetched(fetched_with_payload: DataFrame, corpus_seed: int = 42, img_side: int = 16) -> DataFrame:
    """Per-row verdicts. Input columns: round, url_id, image_id, bytes, fmt,
    caption, phash."""

    def _verify(batches: Iterator) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc

        run = _make_kernel(corpus_seed, img_side)

        for rb in _prefetch(batches):
            col = {name: rb.column(i) for i, name in enumerate(rb.schema.names)}

            # -- ids: dictionary-encode (C++), parse k once per UNIQUE id --
            id_enc = pc.dictionary_encode(col["image_id"])
            id_idx = id_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            id_null = id_enc.indices.is_null().to_numpy(zero_copy_only=False)
            dict_ids = id_enc.dictionary.to_pylist()
            k_of_dict = np.array([parse_k(s) for s in dict_ids] or [-1], dtype=np.int64)
            ks = np.where(id_null, -1, k_of_dict[np.where(id_null, 0, id_idx)])

            phashes = col["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
            psnr_db, psnr_ok, caption_ok, phash_ok = run(
                ks, col["bytes"], phashes, caption_arr=col["caption"]
            )

            yield pa.RecordBatch.from_arrays(
                [
                    col["round"],
                    col["url_id"],
                    col["image_id"],
                    col["fmt"],
                    pa.array(psnr_db, pa.float64()),
                    pa.array(psnr_ok, pa.bool_()),
                    pa.array(caption_ok, pa.bool_()),
                    pa.array(phash_ok, pa.bool_()),
                ],
                names=[
                    "round", "url_id", "image_id", "fmt",
                    "psnr_db", "psnr_ok", "caption_ok", "phash_ok",
                ],
            )

    return fetched_with_payload.mapInArrow(_verify, schema=VERIFY_SCHEMA)


def stats_input(fetched_with_payload: DataFrame) -> DataFrame:
    """JVM pre-projection for ``verify_stats``: everything codegen can check
    stays out of the Python hop. k is parsed from image_id (digits-only,
    agreeing with ``parse_k``); the byte-exact caption check runs as a JVM
    string equality against the expected-caption SQL twin."""
    k = F.coalesce(
        F.when(
            F.col("image_id").rlike("^img[0-9]{1,18}$"),
            F.expr("try_cast(substring(image_id, 4) as bigint)"),
        ),
        F.lit(-1),
    )
    proj = fetched_with_payload.select(
        k.alias("k"), "bytes", "phash", F.col("caption").alias("_cap")
    )
    cap_ok = F.coalesce(
        F.col("_cap") == F.expr(_expected_caption_sql("k")), F.lit(False)
    )
    return proj.select("k", "bytes", "phash", cap_ok.alias("caption_ok"))


def verify_stats(fetched_with_payload: DataFrame, corpus_seed: int = 42, img_side: int = 16) -> DataFrame:
    """Aggregate verify: same kernel, but each Arrow batch folds to ONE count
    row — the form the engine's lineage counters consume. Returns a 1-row
    DataFrame (n, n_psnr_ok, n_caption_ok, n_phash_ok, n_ok). At 10^10 rows
    the per-row verdict set is never materialized or shipped."""

    def _verify(batches: Iterator) -> Iterator:
        import pyarrow as pa

        run = _make_kernel(corpus_seed, img_side)

        for rb in _prefetch(batches):
            col = {name: rb.column(i) for i, name in enumerate(rb.schema.names)}
            ks = col["k"].to_numpy(zero_copy_only=False).astype(np.int64)
            phashes = col["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
            cap_pre = col["caption_ok"].to_numpy(zero_copy_only=False).astype(bool)
            psnr_db, psnr_ok, caption_ok, phash_ok = run(
                ks, col["bytes"], phashes, caption_pre=cap_pre
            )
            ok = psnr_ok & caption_ok & phash_ok
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([rb.num_rows], pa.int64()),
                    pa.array([int(psnr_ok.sum())], pa.int64()),
                    pa.array([int(caption_ok.sum())], pa.int64()),
                    pa.array([int(phash_ok.sum())], pa.int64()),
                    pa.array([int(ok.sum())], pa.int64()),
                ],
                names=["n", "n_psnr_ok", "n_caption_ok", "n_phash_ok", "n_ok"],
            )

    return (
        stats_input(fetched_with_payload)
        .mapInArrow(_verify, schema=STATS_SCHEMA)
        .agg(
            F.sum("n").alias("n"),
            F.sum("n_psnr_ok").alias("n_psnr_ok"),
            F.sum("n_caption_ok").alias("n_caption_ok"),
            F.sum("n_phash_ok").alias("n_phash_ok"),
            F.sum("n_ok").alias("n_ok"),
        )
    )
