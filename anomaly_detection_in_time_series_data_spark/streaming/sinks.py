"""foreachBatch sinks: custom merge logic per micro-batch.

``upsert_foreach_batch`` is the keep-latest-per-key (upsert/compact) sink
the built-in file sink can't express — the standard pattern for streaming
CDC/dedup into a queryable table. Each micro-batch:

1. union the batch with the current table state,
2. keep the newest row per key (row_number over ``order_col`` desc),
3. write to a staging dir, then atomically swap it in.

foreachBatch gives at-least-once delivery per checkpointed batch; the
merge is idempotent (re-processing a batch converges to the same table),
which upgrades the end-to-end result to effectively-once.

At scale the swap-directory step becomes a transactional table commit
(Iceberg/Delta `MERGE INTO`); the micro-batch merge shape is identical —
this module keeps the dependency-free parquet form.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _recover_store(out: Path) -> None:
    """If a previous ``_swap_in`` crashed between renaming the live table
    aside and renaming staging in, the live dir is missing but a
    ``.old-<batch>`` sibling still holds the last committed state —
    restore the newest one.  Called before every read of the store so a
    checkpoint replay resumes from the preserved history instead of
    silently rebuilding from an empty table (ADVICE r6: the
    rmtree-then-rename window permanently deleted the dimension)."""
    if out.exists():
        return
    olds = sorted(
        out.parent.glob(out.name + ".old-*"),
        key=lambda q: int(q.name.rsplit("-", 1)[1]),
    )
    if olds:
        olds[-1].rename(out)
        for stale in olds[:-1]:
            shutil.rmtree(stale, ignore_errors=True)


def _swap_in(staging: Path, out: Path, batch_id: int) -> None:
    """Crash-safe table swap: rename the live dir ASIDE (never delete it
    before its replacement is in place), rename staging in, then drop the
    aside copy.  At no instant do zero on-disk copies of the table exist,
    so a crash at any point is recoverable: either ``out`` survives, or
    ``_recover_store`` restores it from the ``.old-*`` sibling on the
    next batch/replay.  At scale this step IS the transactional commit
    (Iceberg/Delta snapshot swap); this is the dependency-free parquet
    equivalent with the same no-torn-state guarantee."""
    old = Path(f"{out}.old-{batch_id}")
    shutil.rmtree(old, ignore_errors=True)  # stale copy from a replayed batch
    if out.exists():
        out.rename(old)
    staging.rename(out)
    shutil.rmtree(old, ignore_errors=True)


def merge_latest(
    current: DataFrame | None,
    batch: DataFrame,
    key_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Keep the newest row per key across current state + new batch.

    Ties on ``order_col`` break toward the incoming batch (a `_src` rank
    column, dropped on output) so replayed batches overwrite cleanly.
    """
    tagged = batch.withColumn("_src", F.lit(1))
    if current is not None:
        tagged = current.withColumn("_src", F.lit(0)).unionByName(tagged)
    w = Window.partitionBy(*key_cols).orderBy(F.desc(order_col), F.desc("_src"))
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def upsert_foreach_batch(
    stream: DataFrame,
    path: str,
    *,
    key_cols: list[str],
    order_col: str,
    checkpoint: str,
):
    """Start a foreachBatch streaming query that upserts into ``path``.

    Returns the StreamingQuery (caller awaits termination / stops it).
    """

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = Path(path)
        _recover_store(out)
        current = spark.read.parquet(str(out)) if out.exists() else None
        latest = merge_latest(current, batch_df, key_cols, order_col)
        staging = Path(f"{path}.stage-{batch_id}")
        # Materialize staging BEFORE touching the live dir (the `latest`
        # plan still reads it), then crash-safe swap.
        latest.write.mode("overwrite").parquet(str(staging))
        _swap_in(staging, out, batch_id)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def scd2_foreach_batch(
    stream: DataFrame,
    path: str,
    *,
    keys: list[str],
    tracked: list[str],
    ts_col: str,
    checkpoint: str,
    seq_col: str | None = None,
):
    """Start a foreachBatch streaming query that folds each micro-batch
    into a TYPE-2 slowly-changing dimension at ``path`` via
    ``cdc.scd2_merge`` — the streaming upsert unified with the batch CDC
    operator (one merge implementation, two runtimes).

    Each micro-batch is a CDC delivery (one row per key, or per
    (key, seq) when ``seq_col`` is given): unseen keys open a version,
    unchanged re-deliveries are no-ops, changes close the open row at the
    update timestamp and insert a new open version.  Because the no-op
    case makes ``scd2_merge`` idempotent on re-delivered batches,
    foreachBatch's at-least-once replay converges — the same
    effectively-once argument as ``upsert_foreach_batch``, with history
    preserved instead of overwritten.

    ``seq_col``: optional integer column giving the CDC sequence ORDER of
    sub-batches; if one trigger coalesces several deliveries (file-source
    backlog), they are folded in ascending ``seq_col`` order so the
    resulting history is independent of trigger boundaries.  The distinct
    sub-batch list is a driver-side collect bounded by the number of CDC
    deliveries per trigger (single-digit), never by data size.

    State lives as a plain parquet table with staging-dir swap (the
    transactional-table commit at scale — Iceberg/Delta MERGE — keeps the
    identical micro-batch merge shape).
    """
    from ..operators.cdc import scd2_merge

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = Path(path)
        _recover_store(out)
        if out.exists():
            current = spark.read.parquet(str(out))
        else:
            # Build the empty-store schema programmatically: dropping a
            # None seq_col crashes (PySparkTypeError), and string-joined
            # DDL breaks on non-identifier column names (ADVICE r6).
            base = (
                batch_df.drop(seq_col) if seq_col is not None else batch_df
            )
            fields = [f for f in base.schema.fields if f.name != ts_col]
            current = spark.createDataFrame(
                [],
                schema=T.StructType(
                    fields
                    + [
                        T.StructField("valid_from", T.TimestampType()),
                        T.StructField("valid_to", T.TimestampType()),
                    ]
                ),
            )
        if seq_col is not None:
            seqs = sorted(
                r[0] for r in batch_df.select(seq_col).distinct().collect()
            )
            subs = [
                batch_df.filter(F.col(seq_col) == s).drop(seq_col)
                for s in seqs
            ]
        else:
            subs = [batch_df]
        for i, upd in enumerate(subs):
            current = scd2_merge(
                current, upd, keys=keys, tracked=tracked, ts_col=ts_col
            )
            # materialize BETWEEN folds so a multi-delivery trigger stays
            # one-merge-deep (the scd2_event_type_history plan-depth
            # lesson; scd2_merge is single-pass since r12 but folds still
            # compound join-over-join).  The LAST fold writes directly:
            # the staging write below is its materialization, and an
            # eager checkpoint here would compute the merged dimension
            # twice per trigger (optimization r13, guide §2.4 — the
            # upsert/streaks sinks already follow this write-direct
            # pattern).
            if i < len(subs) - 1:
                current = current.localCheckpoint(eager=True)
        staging = Path(f"{path}.stage-{batch_id}")
        current.write.mode("overwrite").parquet(str(staging))
        _swap_in(staging, out, batch_id)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaks_foreach_batch(
    stream: DataFrame,
    path: str,
    *,
    checkpoint: str,
):
    """Start a foreachBatch streaming query that INCREMENTALLY maintains
    per-user consecutive-day streak statistics at ``path`` — the
    gaps-and-islands computation (`user_longest_streaks`) as an
    incrementally-maintained view: each micro-batch of (user_id,
    day_idx) activity folds into per-user state (active days, longest
    streak, streak count, current open streak, last seen day) WITHOUT
    rescanning history.

    The fold is pure DataFrame algebra: islands WITHIN the batch (one
    window), then a full-outer merge with state where the batch's first
    island extends the open streak iff it starts at last_day + 1.
    Unlike ``scd2_merge`` the fold is NOT naturally idempotent (counts
    add), so exactly-once comes from the OTHER standard foreachBatch
    discipline: the store carries the last applied ``_batch_id`` and a
    replayed batch (<= applied) is skipped — idempotence by batch-id
    fencing rather than by algebraic no-op.

    Contract: deliveries must arrive in ascending day order per user
    (every batch day > the user's stored last_day); the file-source
    staging in `streaming_streak_maintenance` guarantees it.  Out-of-
    order history would need the full recompute — which is exactly the
    trade an incremental view buys into.  The contract is MECHANICAL,
    not documentary (ADVICE r7): a batch whose per-user min day is <=
    the user's stored last_day raises with a recompute hint instead of
    silently corrupting streak counts, and a FENCED batch (id <= the
    stored max — e.g. a fresh checkpoint over an existing store
    restarting ids at 0) is only skipped when it contains no unseen
    (user, day) pairs; a fenced batch carrying novel days raises loudly
    (checkpoint/store mismatch) rather than dropping deliveries.  Both
    guards are joins against the batch's own user set only.

    Scale: state is one row per user; each fold shuffles only the
    batch's user set; the store swap is the crash-safe rename-aside
    (`_swap_in`/`_recover_store`).
    """

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = Path(path)
        _recover_store(out)
        state = None
        if out.exists():
            state = spark.read.parquet(str(out))
            applied = state.agg(F.max("_batch_id")).collect()[0][0]
            if applied is not None and applied >= batch_id:
                # Fenced batch.  Skipping is only safe for a true REPLAY
                # of already-folded data; a fresh checkpoint over an
                # existing store restarts batch ids at 0, and silently
                # skipping would drop genuinely new deliveries.  Any
                # (user, day) beyond the user's stored last_day proves
                # the batch is novel -> fail loudly.
                novel = (
                    batch_df.select("user_id", "day_idx")
                    .distinct()
                    .join(
                        state.select("user_id", "last_day"),
                        "user_id",
                        "left",
                    )
                    .filter(
                        F.col("last_day").isNull()
                        | (F.col("day_idx") > F.col("last_day"))
                    )
                    .limit(1)
                    .count()
                )
                if novel:
                    raise ValueError(
                        f"streaks_foreach_batch: batch {batch_id} is fenced "
                        f"(store already applied batch {applied}) but carries "
                        "unseen (user, day) activity — checkpoint/store "
                        "mismatch (fresh checkpoint over an existing store?). "
                        "Point the query at a fresh store path or recompute "
                        "the view from full history."
                    )
                return  # replayed delivery: already folded (exactly-once)
        w = Window.partitionBy("user_id").orderBy("day_idx")
        isl = (
            batch_df.select("user_id", "day_idx")
            .distinct()
            .select(
                "user_id",
                "day_idx",
                (F.col("day_idx") - F.row_number().over(w)).alias("grp"),
            )
        )
        g = isl.groupBy("user_id", "grp").agg(
            F.min("day_idx").alias("start"),
            F.max("day_idx").alias("end"),
            F.count("*").cast("bigint").alias("len"),
        )
        wr = Window.partitionBy("user_id").orderBy("start")
        wn = Window.partitionBy("user_id")
        r = g.select(
            "user_id", "start", "end", "len",
            F.row_number().over(wr).alias("rk"),
            F.count("*").over(wn).alias("ni"),
        )
        agg = r.groupBy("user_id").agg(
            F.max("ni").cast("bigint").alias("n_islands"),
            F.max(F.when(F.col("rk") == 1, F.col("start"))).alias("first_start"),
            F.max(F.when(F.col("rk") == 1, F.col("len"))).alias("first_len"),
            F.max(F.when(F.col("rk") == F.col("ni"), F.col("len"))).alias(
                "last_len"
            ),
            F.max(F.when(F.col("rk") == F.col("ni"), F.col("end"))).alias(
                "last_end"
            ),
            F.max(F.when(F.col("rk") > 1, F.col("len"))).alias("max_rest_len"),
            F.sum("len").cast("bigint").alias("batch_days"),
        )
        if state is None:
            state = spark.createDataFrame(
                [],
                schema=T.StructType(
                    [
                        T.StructField("user_id", T.LongType()),
                        T.StructField("n_active_days", T.LongType()),
                        T.StructField("longest_streak", T.LongType()),
                        T.StructField("n_streaks", T.LongType()),
                        T.StructField("cur_streak", T.LongType()),
                        T.StructField("last_day", T.LongType()),
                        T.StructField("_batch_id", T.LongType()),
                    ]
                ),
            )
        st = state.drop("_batch_id").alias("st")
        ba = agg.alias("ba")
        z = F.lit(0).cast("bigint")
        # Ascending-order contract, enforced in-fold: a batch whose first
        # day for some user is <= that user's stored last_day is
        # out-of-order (or a partial overlap) and would corrupt the
        # additive streak counts.  The guard rides the merge projection
        # itself (raise_error inside the staging write) instead of a
        # separate join+count Spark job per trigger (optimization r12,
        # guide §2.4): a violating row fails the staging write BEFORE
        # ``_swap_in``, so the store is untouched and the streaming query
        # fails loudly with the same ascending-day message.
        ooo = F.col("st.last_day").isNotNull() & (
            F.col("ba.first_start") <= F.col("st.last_day")
        )
        ooo_guard = F.when(
            ooo,
            F.raise_error(
                F.lit(
                    f"streaks_foreach_batch: batch {batch_id} violates "
                    "the ascending-day contract (some user's batch "
                    "activity starts at or before their stored last_day). "
                    "The incremental fold cannot apply out-of-order "
                    "history — recompute the view from full history "
                    "instead."
                )
            ).cast("bigint"),
        ).otherwise(z)
        ext = F.col("st.last_day").isNotNull() & (
            F.col("ba.first_start") == F.col("st.last_day") + 1
        )
        adj_first = F.col("ba.first_len") + F.when(
            ext, F.col("st.cur_streak")
        ).otherwise(z)
        has_batch = F.col("ba.user_id").isNotNull()
        merged = st.join(
            ba, F.col("st.user_id") == F.col("ba.user_id"), "full_outer"
        ).select(
            F.coalesce(F.col("st.user_id"), F.col("ba.user_id")).alias(
                "user_id"
            ),
            F.when(
                has_batch,
                F.coalesce(F.col("st.n_active_days"), z)
                + F.col("ba.batch_days")
                + ooo_guard,
            )
            .otherwise(F.col("st.n_active_days"))
            .alias("n_active_days"),
            F.when(
                has_batch,
                F.greatest(
                    F.coalesce(F.col("st.longest_streak"), z),
                    adj_first,
                    F.coalesce(F.col("ba.max_rest_len"), z),
                ),
            )
            .otherwise(F.col("st.longest_streak"))
            .alias("longest_streak"),
            F.when(
                has_batch,
                F.coalesce(F.col("st.n_streaks"), z)
                + F.col("ba.n_islands")
                - F.when(ext, F.lit(1).cast("bigint")).otherwise(z),
            )
            .otherwise(F.col("st.n_streaks"))
            .alias("n_streaks"),
            F.when(
                has_batch,
                F.when(F.col("ba.n_islands") == 1, adj_first).otherwise(
                    F.col("ba.last_len")
                ),
            )
            .otherwise(F.col("st.cur_streak"))
            .alias("cur_streak"),
            F.when(has_batch, F.col("ba.last_end"))
            .otherwise(F.col("st.last_day"))
            .alias("last_day"),
            F.lit(batch_id).cast("bigint").alias("_batch_id"),
        )
        staging = Path(f"{path}.stage-{batch_id}")
        # The in-fold ascending-day guard (ooo_guard above) fires MID
        # staging write — remove the partial stage dir before re-raising
        # so a violation leaves only the untouched live store behind
        # (ADVICE r12).
        try:
            merged.write.mode("overwrite").parquet(str(staging))
        except Exception:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        _swap_in(staging, out, batch_id)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _ckpt_token(checkpoint: str) -> str:
    """Identity of a checkpoint location, stored alongside ``_batch_id``
    in the non-idempotent sinks' state so that ``applied == batch_id``
    can be CLASSIFIED instead of guessed: same token = the same
    checkpoint re-delivering after a crash between ``_swap_in`` and the
    offset commit (skip); different token = a fresh checkpoint pointed
    at a reused store, where skipping would silently drop the first
    genuinely-new delivery (raise).

    The token is a random id minted ONCE into ``<checkpoint>/
    _sink_identity`` (ADVICE r11): keying identity on the resolved
    filesystem PATH made a legitimate relocation of a (store,
    checkpoint) pair — backup/restore, a different mount point or
    container path — raise on the crash-window replay, turning a
    recoverable restart into manual surgery.  The identity file travels
    WITH the checkpoint, so a moved pair still classifies as
    same-checkpoint.  Residual hazard, documented at each sink: deleting
    and re-creating the checkpoint at the SAME path mints a new identity
    and raises on a reused store — pair a new checkpoint with a new
    store path."""
    import uuid

    tok_file = Path(checkpoint) / "_sink_identity"
    if tok_file.exists():
        return tok_file.read_text().strip()
    tok_file.parent.mkdir(parents=True, exist_ok=True)
    token = uuid.uuid4().hex
    tmp = tok_file.with_name(tok_file.name + ".tmp")
    tmp.write_text(token)
    tmp.rename(tok_file)  # single rename: no torn reads from listeners
    return token


def _same_ckpt(stored_tok: str, ckpt_token: str, checkpoint: str) -> bool:
    """True when a store's recorded ``_ckpt`` was written by THIS
    checkpoint.  Accepts the legacy pre-r12 token (the resolved
    checkpoint path) so stores written before the identity-file scheme
    keep classifying crash replays correctly instead of bricking."""
    return stored_tok == ckpt_token or stored_tok == str(
        Path(checkpoint).resolve()
    )


def digest_foreach_batch(
    stream: DataFrame,
    path: str,
    *,
    checkpoint: str,
):
    """Start a foreachBatch query that INCREMENTALLY maintains an
    order-insensitive CONTENT DIGEST at ``path`` — the streaming twin of
    `table_fingerprint_checksum` and the third idempotence discipline in
    this module: `scd2_merge` replays as an algebraic no-op,
    `streaks_foreach_batch` fences because its fold ADDS, and this fold
    is a COMMUTATIVE MONOID MERGE (mod-sum, xor, min, max, count fold
    associatively), so incremental maintenance is exact by construction
    — but replay still double-counts, so it shares the batch-id fence.

    Expects a single bigint column ``h`` (the per-row content hash).
    State is ONE row: (n_rows, checksum_sum, checksum_xor, h_min, h_max,
    _batch_id); the sum folds through decimal(38,0) before the mod so
    two near-2^63 partials cannot overflow.

    Scale: each trigger reduces its batch to one row map-side and merges
    against a 1-row store — the cheapest possible IVM; a billion-row
    delivery costs its scan and nothing else.

    Contract: a fresh checkpoint MUST pair with a fresh store path.  A
    digest carries no novelty signal (unlike the streaks sink, which can
    compare batch user-days against state), so the store records WHICH
    checkpoint wrote it (``_ckpt``): batch ids restarting at or below
    applied state from a DIFFERENT checkpoint raise (silent skip would
    drop data undetectably); ``applied == batch_id`` from the SAME
    checkpoint is the crash-window replay (a crash between ``_swap_in``
    and the offset commit, including batch 0 on the very first delivery)
    and skips, or the stream would fail permanently on every restart in
    that window.  Residual hazard: deleting and re-creating the
    checkpoint at the SAME path defeats the token — don't do that over a
    live store."""
    M = 9223372036854775807
    ckpt_token = _ckpt_token(checkpoint)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = Path(path)
        _recover_store(out)
        state = None
        if out.exists():
            state = spark.read.parquet(str(out))
            has_tok = "_ckpt" in state.columns
            aggs = [F.max("_batch_id").alias("applied")]
            if has_tok:
                aggs.append(F.max("_ckpt").alias("tok"))
            srow = state.agg(*aggs).collect()[0]
            applied = srow["applied"]
            # Legacy stores (pre-token) carry no _ckpt column; treat as
            # same-checkpoint to preserve their old skip-on-equal
            # behavior rather than bricking existing stores.
            stored_tok = srow["tok"] if has_tok else ckpt_token
            if applied is not None and applied >= batch_id:
                if applied > batch_id or not _same_ckpt(
                    stored_tok, ckpt_token, checkpoint
                ):
                    # Either ids restarted BELOW applied state, or the
                    # same id arrived from a DIFFERENT checkpoint — both
                    # mean a fresh checkpoint was pointed at a reused
                    # store.  A digest has no novelty signal, so skipping
                    # would silently drop new deliveries — fail loudly.
                    raise ValueError(
                        f"digest store {path} already holds batch "
                        f"{applied} (written by checkpoint "
                        f"{stored_tok}) but checkpoint {ckpt_token} "
                        f"delivered batch {batch_id} — fresh checkpoint "
                        "over an existing store; pair a new checkpoint "
                        "with a new store path"
                    )
                return  # same-checkpoint crash replay: skip, never re-fold
            state = state.drop("_ckpt") if has_tok else state
        if batch_df.isEmpty():
            # A zero-row delivery contributes the monoid identity; folding
            # it would turn sum/bit_xor/min/max into NULLs and permanently
            # corrupt the digest, so it is a no-op by construction.
            return
        b = batch_df.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            (
                F.sum(F.col("h").cast("decimal(38,0)"))
                % F.lit(M).cast("decimal(38,0)")
            )
            .cast("bigint")
            .alias("checksum_sum"),
            F.expr("bit_xor(h)").cast("bigint").alias("checksum_xor"),
            F.min("h").cast("bigint").alias("h_min"),
            F.max("h").cast("bigint").alias("h_max"),
        )
        if state is not None:
            s = state.select(
                F.col("n_rows").alias("s_n"),
                F.col("checksum_sum").alias("s_sum"),
                F.col("checksum_xor").alias("s_xor"),
                F.col("h_min").alias("s_min"),
                F.col("h_max").alias("s_max"),
            )
            b = b.crossJoin(F.broadcast(s)).select(
                (F.col("n_rows") + F.col("s_n")).cast("bigint").alias("n_rows"),
                (
                    (
                        F.col("checksum_sum").cast("decimal(38,0)")
                        + F.col("s_sum").cast("decimal(38,0)")
                    )
                    % F.lit(M).cast("decimal(38,0)")
                )
                .cast("bigint")
                .alias("checksum_sum"),
                F.col("checksum_xor")
                .bitwiseXOR(F.col("s_xor"))
                .cast("bigint")
                .alias("checksum_xor"),
                F.least("h_min", "s_min").cast("bigint").alias("h_min"),
                F.greatest("h_max", "s_max").cast("bigint").alias("h_max"),
            )
        # write-direct: the staging write materializes the 1-row digest;
        # an eager checkpoint here doubled the pass per trigger (r13).
        merged = b.withColumn(
            "_batch_id", F.lit(batch_id).cast("bigint")
        ).withColumn("_ckpt", F.lit(ckpt_token))
        staging = Path(f"{path}.stage-{batch_id}")
        merged.write.mode("overwrite").parquet(str(staging))
        _swap_in(staging, out, batch_id)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def hll_foreach_batch(
    stream: DataFrame,
    path: str,
    *,
    checkpoint: str,
):
    """Start a foreachBatch query that INCREMENTALLY maintains an HLL
    register table at ``path`` — the fourth idempotence discipline in
    this module, and the simplest: the register merge is MAX per bucket,
    which is not just a commutative monoid (like the digest's sum/xor)
    but IDEMPOTENT — max(a, a) = a — so replayed batches, duplicated
    deliveries, and even a fresh checkpoint over an existing store are
    all algebraic no-ops.  No batch-id fence is needed or kept beyond
    observability; contrast with ``digest_foreach_batch``, whose
    sum-fold MUST fence and raise.

    Expects rows ``(reg bigint, rho bigint)`` — the register index and
    the leading-zero rank the query computes from a portable content
    hash.  State is at most one row per register (e.g. 256 rows for an
    8-bit bucket split): kilobyte-scale regardless of stream volume —
    the whole point of maintaining a cardinality SKETCH instead of a
    distinct-key set, whose state would grow with the data.

    Scale: each trigger reduces its batch to <=registers rows map-side
    (partial max), merges against the register-sized store, and swaps
    atomically (same ``_swap_in`` discipline as every sink here)."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = Path(path)
        _recover_store(out)
        if batch_df.isEmpty():
            return  # max-identity: nothing to fold
        b = batch_df.groupBy("reg").agg(
            F.max("rho").cast("bigint").alias("rho")
        )
        if out.exists():
            state = spark.read.parquet(str(out)).select("reg", "rho")
            b = b.unionByName(state).groupBy("reg").agg(
                F.max("rho").cast("bigint").alias("rho")
            )
        # write-direct (r13): staging write is the materialization
        merged = b.withColumn("_batch_id", F.lit(batch_id).cast("bigint"))
        staging = Path(f"{path}.stage-{batch_id}")
        merged.write.mode("overwrite").parquet(str(staging))
        _swap_in(staging, out, batch_id)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def cms_foreach_batch(
    stream: DataFrame,
    path: str,
    *,
    checkpoint: str,
):
    """Start a foreachBatch query that INCREMENTALLY maintains a
    count-min-sketch table at ``path`` — the fifth IVM discipline in this
    module, and the first KEYED commutative-monoid fold: per batch the
    delivery collapses map-side to at most depth*width (hash-row, bucket)
    partial counts, which merge into the store by (i, b) ADDITION.

    Addition is a commutative monoid but NOT idempotent (contrast the HLL
    sink's max), so this sink shares the digest sink's tokened batch-id
    fence: the store records which checkpoint wrote it (``_ckpt``);
    applied == batch_id from the SAME checkpoint is the crash-window
    replay (including batch 0) and skips, while applied > batch_id or
    the same id from a DIFFERENT checkpoint — a fresh checkpoint over a
    reused store — raises, because a sketch carries no novelty signal to
    tell replay from new deliveries and silent skip would drop data.

    Expects rows ``(i bigint, b bigint)`` (hash row + bucket, one per
    contributing input row) or pre-combined ``(i, b, n bigint)``.  State
    is at most depth*width + sketch metadata rows — kilobytes regardless
    of stream volume, the same reason the batch `operators/sketches.py`
    CMS shuffles O(partitions * depth * width).

    Scale: per trigger the batch reduces map-side to sketch-sized
    partials, merges against a sketch-sized store, and swaps atomically
    (`_swap_in`); a billion-row delivery costs its scan and nothing else,
    and day-level sketch stores roll up by the same addition downstream.
    """
    ckpt_token = _ckpt_token(checkpoint)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = Path(path)
        _recover_store(out)
        state = None
        if out.exists():
            state = spark.read.parquet(str(out))
            has_tok = "_ckpt" in state.columns
            aggs = [F.max("_batch_id").alias("applied")]
            if has_tok:
                aggs.append(F.max("_ckpt").alias("tok"))
            srow = state.agg(*aggs).collect()[0]
            applied = srow["applied"]
            stored_tok = srow["tok"] if has_tok else ckpt_token  # legacy
            if applied is not None and applied >= batch_id:
                if applied > batch_id or not _same_ckpt(
                    stored_tok, ckpt_token, checkpoint
                ):
                    raise ValueError(
                        f"cms store {path} already holds batch {applied} "
                        f"(written by checkpoint {stored_tok}) but "
                        f"checkpoint {ckpt_token} delivered batch "
                        f"{batch_id} — fresh checkpoint over an existing "
                        "store; pair a new checkpoint with a new store "
                        "path"
                    )
                return  # same-checkpoint crash replay: never re-fold
        if batch_df.isEmpty():
            return  # zero-row delivery is the addition identity
        cols = set(batch_df.columns)
        n = F.col("n") if "n" in cols else F.lit(1)
        b = batch_df.groupBy("i", "b").agg(
            F.sum(n).cast("bigint").alias("n")
        )
        if state is not None:
            b = (
                b.unionByName(
                    state.select("i", "b", "n"), allowMissingColumns=False
                )
                .groupBy("i", "b")
                .agg(F.sum("n").cast("bigint").alias("n"))
            )
        # write-direct (r13): staging write is the materialization
        merged = b.withColumn(
            "_batch_id", F.lit(batch_id).cast("bigint")
        ).withColumn("_ckpt", F.lit(ckpt_token))
        staging = Path(f"{path}.stage-{batch_id}")
        merged.write.mode("overwrite").parquet(str(staging))
        _swap_in(staging, out, batch_id)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def mg_foreach_batch(
    stream: DataFrame,
    path: str,
    *,
    capacity: int,
    checkpoint: str,
):
    """Start a foreachBatch query that INCREMENTALLY maintains a
    Misra-Gries heavy-hitters summary at ``path`` — the SIXTH IVM
    discipline in this module, and the first BOUNDED-STATE LOSSY fold:
    the store never holds more than ``capacity`` (key, count) rows, and
    the merge step is the mergeable-summaries rule (Agarwal et al.,
    PODS'12): sum counts per key across (state union batch), find d =
    the (capacity+1)-th largest merged count (0 when at most
    ``capacity`` keys survive the sum), subtract d from every count and
    keep the strictly positive ones.  The result carries the classic MG
    guarantee — every surviving count undercounts its true frequency by
    at most the total decremented mass, and any key with true frequency
    above n/(capacity+1) is present.

    The fold is DETERMINISTIC given the delivery sequence (d is a
    multiset function of the merged counts; survivors are exactly the
    counts above d), but — unlike the CMS sink's pure addition — it is
    order-DEPENDENT across deliveries, so the paired oracle must replay
    the same per-delivery fold (an unrolled CTE per trigger), not a
    one-shot aggregate.  Replay discipline: trimming is not idempotent
    and not an algebraic no-op, so this sink shares the digest/cms
    TOKENED batch-id fence: applied == batch_id from the same
    checkpoint skips (crash-window replay), anything else over applied
    state raises.

    Expects rows ``(k bigint)`` or pre-combined ``(k, n bigint)``.

    Scale: per trigger the delivery reduces map-side to per-key counts
    (bounded by the key domain, and the summary itself bounds state at
    ``capacity`` rows — bytes, forever); the trim threshold is computed
    from a <= capacity+1-row ordered slice, never a data-sized sort."""
    ckpt_token = _ckpt_token(checkpoint)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = Path(path)
        _recover_store(out)
        state = None
        if out.exists():
            state = spark.read.parquet(str(out))
            has_tok = "_ckpt" in state.columns
            aggs = [F.max("_batch_id").alias("applied")]
            if has_tok:
                aggs.append(F.max("_ckpt").alias("tok"))
            srow = state.agg(*aggs).collect()[0]
            applied = srow["applied"]
            stored_tok = srow["tok"] if has_tok else ckpt_token  # legacy
            if applied is not None and applied >= batch_id:
                if applied > batch_id or not _same_ckpt(
                    stored_tok, ckpt_token, checkpoint
                ):
                    raise ValueError(
                        f"mg store {path} already holds batch {applied} "
                        f"(written by checkpoint {stored_tok}) but "
                        f"checkpoint {ckpt_token} delivered batch "
                        f"{batch_id} — fresh checkpoint over an existing "
                        "store; pair a new checkpoint with a new store "
                        "path"
                    )
                return  # same-checkpoint crash replay: never re-trim
        if batch_df.isEmpty():
            return  # zero-row delivery is the identity
        cols = set(batch_df.columns)
        n = F.col("n") if "n" in cols else F.lit(1)
        b = batch_df.groupBy("k").agg(F.sum(n).cast("bigint").alias("n"))
        if state is not None:
            b = (
                b.unionByName(state.select("k", "n"))
                .groupBy("k")
                .agg(F.sum("n").cast("bigint").alias("n"))
            )
        b = b.localCheckpoint(eager=True)
        # trim threshold: the (capacity+1)-th largest merged count, read
        # from a bounded ordered slice (<= capacity+1 rows collected)
        top = b.orderBy(F.desc("n"), F.asc("k")).limit(capacity + 1).collect()
        d = top[-1]["n"] if len(top) > capacity else 0
        trimmed = b.select("k", (F.col("n") - F.lit(d)).alias("n")).filter(
            F.col("n") > 0
        )
        # write-direct (r13): trimmed reads the checkpointed b, and the
        # staging write is merged's only consumer
        merged = trimmed.withColumn(
            "_batch_id", F.lit(batch_id).cast("bigint")
        ).withColumn("_ckpt", F.lit(ckpt_token))
        staging = Path(f"{path}.stage-{batch_id}")
        merged.write.mode("overwrite").parquet(str(staging))
        _swap_in(staging, out, batch_id)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
