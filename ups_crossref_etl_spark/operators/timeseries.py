"""Time-series regularization: resample an irregular event stream onto a
fixed grid with forward fill.

Extension layer. The sensor/metrics companion to the streaming windowed
aggregates in ``streaming/events.py``: downstream consumers (feature
stores, charting, drift monitors) want one row per (key, grid step),
not raw irregular events.

Semantics:
- Buckets: ``floor(epoch(ts) / step) * step`` — every observation maps
  to the grid point at-or-before it; the per-bucket value is the
  rounded MEAN of the bucket's observations (deterministic under any
  row order, unlike last-in-bucket which ties on equal timestamps).
- Grid: per key, every step from the key's first bucket to its last
  (no extrapolation beyond either end).
- Fill: empty buckets take the most recent earlier bucket's value
  (forward fill); ``filled`` flags synthesized rows.

Execution shape: per-key bounds and per-bucket means are two map-side-
combinable aggregates on the same key; the grid is ``sequence`` +
``explode`` (row-local generation, no driver loop — a 10-year hourly
grid is 87 k rows per key generated executor-side); the forward fill is
one ``last(ignorenulls)`` window per key ordered by grid time. All
stages cluster on the key column — one logical repartition end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    round_digits: int = 4,
) -> DataFrame:
    """``(key_col, bucket_ts, value, filled)`` — one row per key per
    ``step_seconds`` between the key's first and last observation."""
    if step_seconds <= 0:
        raise ValueError("resample_ffill: step_seconds must be positive")
    step = F.lit(step_seconds)
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step
    ).alias("_b")
    obs = (
        df.select(F.col(key_col).alias("_k"), bucket, F.col(value_col).alias("_v"))
        .groupBy("_k", "_b")
        .agg(F.round(F.avg("_v"), round_digits).alias("_bv"))
    )
    grid = (
        obs.groupBy("_k")
        .agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
        .select(
            "_k",
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), step)
            ).alias("_b"),
        )
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["_k", "_b"], "left")
        .select(
            F.col("_k").alias(key_col),
            F.timestamp_seconds(F.col("_b")).alias("bucket_ts"),
            F.last("_bv", ignorenulls=True).over(w).alias("value"),
            F.col("_bv").isNull().alias("filled"),
        )
    )


def rolling_zscore_outliers(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    window_rows: int = 24,
    threshold: float = 3.0,
    min_history: int = 8,
    round_digits: int = 4,
    value_scale: int | None = None,
) -> DataFrame:
    """Streaming-style anomaly detection on a batch table: flag rows whose
    value deviates more than ``threshold`` sample standard deviations
    from the trailing ``window_rows`` observations of the SAME key.

    The baseline window is strictly *preceding* rows (``N PRECEDING ..
    1 PRECEDING``) so the candidate never contaminates its own
    baseline, and rows with fewer than ``min_history`` prior
    observations are never flagged (cold-start guard). Window order is
    ``(ts, tiebreak)`` — the tiebreak column must be unique per key so
    the frame is deterministic under equal timestamps.

    Execution shape: ONE window spec over the key partition — mean,
    stddev and count share the same frame, so Catalyst evaluates all
    three in a single Window physical operator: one shuffle on the key,
    no self-join (the naive formulation joins each row to its trailing
    window — |rows|×|window| blowup at 100 TB).

    ``value_scale``: when the values are fixed-point (money at scale
    100, basis points at 10 000), pass the scale and the moments are
    computed over EXACT integer window sums (``Σc``, ``Σc²`` — no
    float accumulation), with mean/variance derived by one shared
    float expression. This makes the result independent of summation
    order — reproducible bit-for-bit across partitionings and engines
    (the float path can flip a rounding boundary when a different plan
    adds the same 24 doubles in a different order). ``None`` keeps the
    native float path for genuinely real-valued data.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(order_tiebreak))
        .rowsBetween(-window_rows, -1)
    )
    if value_scale is not None:
        c = F.round(F.col(value_col) * value_scale).cast("bigint")
        n = F.count(c).over(w)
        s1 = F.sum(c).over(w)
        s2 = F.sum(c * c).over(w)
        mu = s1 / n / value_scale
        var = (
            (s2 - s1 * s1 / n)
            / (n - F.lit(1))
            / F.lit(float(value_scale * value_scale))
        )
        sd = F.when(var > 0, F.sqrt(var))
        z = (c / value_scale - mu) / sd
    else:
        mu = F.avg(value_col).over(w)
        sd = F.stddev_samp(value_col).over(w)
        n = F.count(value_col).over(w)
        z = (F.col(value_col) - mu) / sd
    return (
        df.select(
            F.col(key_col),
            F.col(ts_col),
            F.col(order_tiebreak),
            F.col(value_col),
            F.round(mu, round_digits).alias("baseline_mean"),
            F.round(z, round_digits).alias("zscore"),
            n.alias("n_history"),
            sd.alias("_sd"),
        )
        .filter(
            (F.col("n_history") >= min_history)
            & F.col("_sd").isNotNull()
            & (F.col("_sd") > 0)
            & (F.abs(F.col("zscore")) > threshold)
        )
        .drop("_sd")
    )


def groupwise_trend(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    x_origin_epoch: int,
    x_step_seconds: int = 3600,
    value_scale: int = 100,
    min_points: int = 2,
) -> DataFrame:
    """Per-key ordinary-least-squares trend of value over time:
    ``(key, n_points, slope, intercept, r2)`` with slope in value units
    per ``x_step_seconds``.

    Closed-form OLS from the five sufficient statistics
    ``n, Σx, Σy, Σxy, Σx²`` (plus ``Σy²`` for r²) — ONE map-side-
    combinable aggregate per key, no window, no sorting, no iteration:
    the classic "reduce a regression to sums" trick that makes trend
    fitting over a billion keys exactly one shuffle.

    Exactness contract (same policy as :func:`rolling_zscore_outliers`):
    x is rebased to small integers (``(epoch − x_origin_epoch) /
    x_step_seconds``, truncating) and y scaled to integers by
    ``value_scale``, so every sufficient statistic is an EXACT integer —
    the slope/intercept/r² derivations are then single float
    expressions over exact inputs, reproducible bit-for-bit across
    engines and partition orders. Rebasing also keeps ``Σx²`` far from
    int64 overflow (raw epoch seconds squared do not).

    Keys with fewer than ``min_points`` rows or zero x-variance (all
    observations in one step) are dropped — slope is undefined there.
    """
    x = F.floor(
        (F.unix_timestamp(F.col(ts_col)) - F.lit(x_origin_epoch))
        / F.lit(x_step_seconds)
    ).cast("bigint")
    y = F.round(F.col(value_col) * value_scale).cast("bigint")
    agg = df.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
    )
    # derive in DOUBLE: the sufficient statistics are exact integers, but
    # their second-order products (cov², n·Σy²) overflow int64 on real
    # data; double products of exact-int-valued doubles are IEEE-
    # deterministic, so engine parity holds as long as the oracle casts
    # its sums to DOUBLE before the same expression tree
    n = F.col("n_points").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = cov / dx / value_scale
    intercept = (sy - cov / dx * sx) / n / value_scale
    r2 = (cov * cov) / (dx * dy)
    return (
        agg.filter((F.col("n_points") >= min_points) & (dx > 0))
        .select(
            F.col(key_col),
            "n_points",
            F.round(slope, 6).alias("slope"),
            F.round(intercept, 6).alias("intercept"),
            F.when(dy > 0, F.round(r2, 4)).alias("r2"),
        )
    )


def late_arrival_audit(
    df: DataFrame,
    order_col: str,
    ts_col: str,
    type_col: str,
    delay_seconds: int = 600,
    bucket_size: int = 100_000,
) -> DataFrame:
    """Batch watermark audit — the batch twin of Structured Streaming's
    ``numRowsDroppedByWatermark`` (see ``streaming/events.py``
    ``late_drop_stats``): replay the table in arrival order
    (``order_col``), maintain the running high-watermark ``max(event
    time so far)``, and count rows arriving more than ``delay_seconds``
    behind it — exactly the rows a streaming job with that watermark
    would have dropped. Returns per-``type_col``
    ``(n_total, n_late, max_ooo_s)`` (max out-of-order depth, whole
    seconds).

    Scale shape — a running max over a global order is the textbook
    single-partition window trap, so it is computed as a DISTRIBUTED
    PREFIX MAX instead: bucket the order key (``bucket_size`` rows per
    bucket), (1) within-bucket running max via a bucket-partitioned
    window (parallel across buckets), (2) per-bucket maxes — an
    ``n/bucket_size``-row table — get their strictly-earlier prefix max
    on one tiny window, (3) broadcast-join the prefix back and take
    ``greatest(within, prefix)``. 100 TB of events never converge on one
    executor; only the bucket-summary table does (bytes per 100k rows).

    Event times pass through ``epoch_seconds`` (NTZ-safe, whole
    seconds) so the comparison is integer-exact on any engine."""
    from ..functions.dates import epoch_seconds

    base = df.select(
        F.col(order_col).alias("_ord"),
        F.col(type_col).alias("_type"),
        epoch_seconds(ts_col).alias("_sec"),
        F.floor(F.col(order_col) / bucket_size).alias("_b"),
    )
    w_in = (
        Window.partitionBy("_b")
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = base.withColumn("_wm_in", F.max("_sec").over(w_in))
    bmax = base.groupBy("_b").agg(F.max("_sec").alias("_bm"))
    w_pfx = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    pfx = bmax.withColumn("_wm_prev", F.max("_bm").over(w_pfx)).select(
        "_b", "_wm_prev"
    )
    j = within.join(F.broadcast(pfx), "_b")
    # greatest() skips nulls (global first rows have no watermark yet →
    # null → never late); null only when both sides are null
    wm = F.greatest("_wm_in", "_wm_prev")
    audited = j.select(
        "_type",
        "_sec",
        wm.alias("_wm"),
        (F.col("_sec") < wm - F.lit(delay_seconds)).alias("_late"),
        F.when(wm > F.col("_sec"), wm - F.col("_sec"))
        .otherwise(F.lit(0))
        .alias("_ooo"),
    )
    return audited.groupBy(F.col("_type").alias(type_col)).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.coalesce(F.col("_late"), F.lit(False)).cast("long")).alias(
            "n_late"
        ),
        F.max("_ooo").alias("max_ooo_s"),
    )


def windowed_ewma(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
    window: int = 20,
    round_digits: int = 4,
) -> DataFrame:
    """Exponentially-weighted moving average over the last ``window``
    observations per key: adds ``ewma`` to every row —
    ``round(α·Σⱼ (1−α)ʲ·x_{t−j} / Σⱼ α·(1−α)ʲ, round_digits)`` for j in
    [0, window), i.e. the truncated-window EWMA normalized so weights sum
    to 1 (no cold-start bias on short prefixes). ``order_cols`` must be a
    total order within key (e.g. ``[ts, event_id]``) or the fold is
    nondeterministic.

    Why truncated: the classic recursive EWMA is a sequential scan per
    key — on Spark that is one task per key or a driver loop, both wrong
    at scale. The truncated form is ONE window ``collect_list`` over a
    bounded frame (``window`` rows of state per row, constant) + a
    row-local codegen fold — one key-clustered shuffle total, and the
    (1−α)^j weights never underflow because j is bounded. The fold runs
    newest→oldest on both engines (frame collected ascending, reversed
    row-locally), so the gate oracle replays it exactly.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), 0)
    )
    # collected ascending by frame; reverse so j=0 is the current row
    vals = F.reverse(F.collect_list(F.col(value_col)).over(w))
    decay = 1.0 - alpha
    weighted = F.aggregate(
        F.zip_with(
            vals,
            F.transform(
                F.sequence(F.lit(0), F.size(vals) - 1),
                lambda j: F.pow(F.lit(decay), j.cast("double")),
            ),
            lambda x, p: x.cast("double") * p,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    wsum = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.size(vals) - 1),
            lambda j: F.pow(F.lit(decay), j.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return df.withColumn(
        "ewma", F.round(weighted / wsum, round_digits) + F.lit(0.0)
    )


def interval_union_length(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Total length of the UNION of (possibly overlapping) integer
    intervals per key: ``(key_col, n_intervals, n_islands,
    covered_total)`` — the gaps-and-islands reduction behind "total
    active seconds per user", utilization, and coverage metrics, where
    naive ``sum(end - start)`` double-counts overlaps.

    Classic sweep: order intervals by (start, end); an interval opens a
    new island iff its start exceeds the running max end of everything
    before it; the cumulative island count labels islands; each island
    contributes ``max(end) − min(start)``. All three steps are windows/
    groupBys on the SAME key partitioning — one exchange total, and the
    per-row state is two integers (the running max end), never a
    collected interval list. Intervals must be integer-valued (epoch
    seconds): every aggregate is exact, no float hazard.
    """
    w_ord = Window.partitionBy(key_col).orderBy(start_col, end_col)
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    marked = df.withColumn(
        "_new_island",
        F.when(
            F.col(start_col)
            > F.coalesce(
                F.max(end_col).over(w_prev), F.lit(None).cast("long")
            ),
            F.lit(1),
        )
        .otherwise(
            F.when(
                F.max(end_col).over(w_prev).isNull(), F.lit(1)
            ).otherwise(F.lit(0))
        ),
    ).withColumn(
        "_island",
        F.sum("_new_island").over(
            w_ord.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    islands = marked.groupBy(key_col, "_island").agg(
        F.min(start_col).alias("_s"),
        F.max(end_col).alias("_e"),
        F.count(F.lit(1)).alias("_n"),
    )
    return islands.groupBy(key_col).agg(
        F.sum("_n").cast("bigint").alias("n_intervals"),
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum(F.col("_e") - F.col("_s")).cast("bigint").alias("covered_total"),
    )


def mean_shift_scores(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    w: int = 10,
    round_digits: int = 4,
) -> DataFrame:
    """Two-window level-change (changepoint) scores per key: adds
    ``shift_score = round(|mean(last w) − mean(previous w)|, 4)`` to
    every row with two FULL windows behind it (earlier rows get NULL) —
    the sliding mean-shift detector that flags level changes the
    point-outlier z-score (``rolling_zscore_outliers``) misses.

    Page's recursive CUSUM ``S_t = max(0, S_{t−1} + …)`` cannot be a
    window function (the clamp breaks prefix-decomposability) — a
    faithful port would be a sequential per-key scan. The two-window
    form keeps the same detection role with TWO bounded frames over ONE
    key-clustered sort: no recursion, constant per-row state,
    partitioning-independent. Values are accumulated as integer
    micro-units (exact for ≤6-dp inputs, same trick as
    ``rolling_zscore_outliers``), so sums are order-exact and the gate
    hash-compares.
    """
    micros = F.round(F.col(value_col) * 1_000_000).cast("long")
    base = df.withColumn("_m", micros)
    w_recent = (
        Window.partitionBy(key_col).orderBy(*order_cols).rowsBetween(-(w - 1), 0)
    )
    w_prior = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-(2 * w - 1), -w)
    )
    n_r = F.count(F.lit(1)).over(w_recent)
    n_p = F.count(F.lit(1)).over(w_prior)
    mean_r = F.sum("_m").over(w_recent) / n_r
    mean_p = F.sum("_m").over(w_prior) / n_p
    return base.withColumn(
        "shift_score",
        F.when(
            (n_r == w) & (n_p == w),
            F.round(F.abs(mean_r - mean_p) / 1_000_000.0, round_digits)
            + F.lit(0.0),
        ),
    ).drop("_m")


def seasonal_baseline_backtest(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    split_ts: str,
    round_digits: int = 4,
) -> DataFrame:
    """Hour-of-week seasonal-mean forecast with a held-out backtest — the
    baseline every forecasting effort must beat before any model earns
    its compute (a seasonal-naive that loses to nothing still catches
    pipeline bugs: a broken feature join shows up as MAE exploding
    against this floor).

    Model: per (key, day-of-week, hour) mean of ``value_col`` over rows
    BEFORE ``split_ts``; unseen slots fall back to the key's overall
    train mean. Test rows (>= ``split_ts``) score against the
    prediction; returns per key: ``(key, n_test, n_fallback, mae)``.

    Determinism: slot means divide exact DECIMAL sums (one double each,
    identical expression tree on both engines); each row's absolute
    error converts to integer MICRO-UNITS (``round(|v-pred|*1e6)``)
    before summing, so the corpus aggregate is exact int64 math and the
    final division is the only unordered double op — the repo's
    round-before-compare rule applied to an error metric.

    Scale shape: the model is one (key, dow, hour) aggregate over train
    (map-side combinable, ``|keys|*168``-row output — broadcastable);
    scoring is a broadcast join + row-local arithmetic; the backtest
    summary is one key aggregate. No window anywhere.
    """
    dec = "decimal(38,12)"
    dow = (F.dayofweek(F.col(ts_col)) - F.lit(1)).alias("_dow")
    hr = F.hour(F.col(ts_col)).alias("_hr")
    base = df.select(
        F.col(key_col),
        dow,
        hr,
        F.col(value_col).alias("_v"),
        (F.col(ts_col) < F.lit(split_ts).cast("timestamp")).alias("_train"),
    )
    slot = (
        base.filter("_train")
        .groupBy(key_col, "_dow", "_hr")
        .agg(F.sum(F.col("_v").cast(dec)).alias("_s"), F.count(F.lit(1)).alias("_n"))
        .select(
            key_col,
            "_dow",
            "_hr",
            (F.col("_s").cast("double") / F.col("_n").cast("double")).alias("_slot"),
        )
    )
    overall = (
        base.filter("_train")
        .groupBy(key_col)
        .agg(F.sum(F.col("_v").cast(dec)).alias("_s"), F.count(F.lit(1)).alias("_n"))
        .select(
            key_col,
            (F.col("_s").cast("double") / F.col("_n").cast("double")).alias("_fb"),
        )
    )
    test = (
        base.filter(~F.col("_train"))
        .join(F.broadcast(slot), [key_col, "_dow", "_hr"], "left")
        .join(F.broadcast(overall), key_col, "left")
    )
    err_micro = F.round(
        F.abs(F.col("_v") - F.coalesce(F.col("_slot"), F.col("_fb"))) * 1_000_000.0, 0
    ).cast("bigint")
    return (
        test.select(
            F.col(key_col),
            err_micro.alias("_e"),
            F.col("_slot").isNull().cast("long").alias("_f"),
        )
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum("_f").cast("long").alias("n_fallback"),
            F.round(
                (F.sum("_e").cast("double") / F.count(F.lit(1)).cast("double"))
                / 1_000_000.0,
                round_digits,
            ).alias("mae"),
        )
    )


def theil_sen_trend(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    round_digits: int = 6,
    max_points_per_key: int | None = None,
) -> DataFrame:
    """Per-group Theil–Sen slope: the MEDIAN of all pairwise slopes
    ``(v_j - v_i) / (t_j - t_i)`` — the robust complement of
    ``groupwise_trend``'s OLS (one wild outlier drags a least-squares
    slope arbitrarily; Theil–Sen tolerates ~29% contamination). The
    estimator of choice for per-entity drift over noisy telemetry.

    Returns ``(key, n_points, n_pairs, slope)`` with the slope in
    value-units per second, rounded. ``n_points`` counts the points the
    pairing actually saw (post-cap when a cap is set).

    Scale shape: ONE key-clustered self-join generates the pairs (the
    quadratic lives inside each key's partition — per-key event counts
    are the bill, not the corpus), one grouped exact-percentile median
    over (key, slope) rows. ``max_points_per_key`` is the heavy-key
    escape hatch: keys whose history exceeds the cap are DETERMINISTICALLY
    stride-subsampled in time order (keep every ceil(n/cap)-th point, by
    ``row_number() over (key ORDER BY t, v)``) before pairing, bounding
    the per-key pair count at ~cap²/2 no matter how hot the key —
    systematic time sampling preserves trend structure and the estimator
    is stable under it (the standard production cut). The stride rule is
    a pure function of the sorted history, so capped runs are exactly
    reproducible (``q_events_theil_sen_capped`` pins it against SQL; the
    agreement with the uncapped slope is pinned by
    ``q_events_theil_sen_cap_agreement``).
    Pairs with equal timestamps are excluded (undefined slope).
    """
    from ..functions.dates import epoch_seconds

    a = df.select(
        F.col(key_col).alias("_k"),
        epoch_seconds(F.col(ts_col)).alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_v").isNotNull() & F.col("_t").isNotNull())
    if max_points_per_key is not None:
        from pyspark.sql import Window as W

        w = W.partitionBy("_k")
        rn = F.row_number().over(w.orderBy("_t", "_v"))
        n_k = F.count(F.lit(1)).over(w)
        stride = F.ceil(n_k / F.lit(max_points_per_key))
        a = (
            a.withColumn("_rn", rn)
            .withColumn("_stride", stride)
            .filter((F.col("_rn") - 1) % F.col("_stride") == 0)
            .drop("_rn", "_stride")
        )
    # NULL/non-castable values drop BEFORE pairing so n_pairs counts
    # exactly the slopes the median sees (consumers weight by it)
    # r13: materialize ``a`` once — it feeds BOTH pair-join sides and
    # the n_points aggregate (subtree otherwise executed 3x per run)
    # (r14: left EAGER deliberately — making it lazy would change the
    # theil_sen family's physical path and cost 3 driver-window
    # re-verification slots this round for a single saved job)
    a = a.localCheckpoint()
    b = a.select(
        F.col("_k"),
        F.col("_t").alias("_t2"),
        F.col("_v").alias("_v2"),
    )
    pairs = (
        a.join(b, "_k")
        .filter(F.col("_t2") > F.col("_t"))
        .select(
            "_k",
            # integer NANO-slopes before the median: the even-count median
            # interpolates, and (a+b)/2 over int64 is an exact half on
            # every engine — interpolating raw doubles leaves the rounded
            # 6th digit to ulp luck (observed flipping vs the oracle)
            F.round(
                (F.col("_v2") - F.col("_v"))
                / (F.col("_t2") - F.col("_t")).cast("double")
                * 1e9,
                0,
            )
            .cast("bigint")
            .alias("_s"),
        )
    )
    counts = a.groupBy("_k").agg(F.count(F.lit(1)).alias("n_points"))
    return (
        pairs.groupBy("_k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            # + 0.0 folds IEEE -0.0 to 0.0 (hash-comparable)
            (
                F.round(F.percentile("_s", F.lit(0.5)) / 1e9, round_digits)
                + F.lit(0.0)
            ).alias("slope"),
        )
        .join(counts, "_k")
        .select(
            F.col("_k").alias(key_col),
            F.col("n_points").cast("long").alias("n_points"),
            "n_pairs",
            "slope",
        )
    )


def mann_kendall(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    round_digits: int = 4,
    max_points_per_key: int | None = None,
) -> DataFrame:
    """Per-group Mann–Kendall trend test: ``S = Σ_{i<j} sign(v_j − v_i)``
    over the time-ordered series, with the tie-corrected variance
    ``Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18`` and the
    continuity-corrected normal score ``z`` — the significance companion
    to ``theil_sen_trend`` (Theil–Sen says HOW steep, Mann–Kendall says
    whether a monotone trend exists at all; the pair is the standard
    non-parametric trend readout).

    Returns ``(key, n_points, s_stat, z)``; ``z`` rounded, −0.0 folded.
    ``S`` is an exact integer (a sum of ±1/0), so only ``z`` touches
    floats. Pairs with equal timestamps are excluded (their order is
    undefined), matching ``theil_sen_trend``; ties in VALUE contribute
    sign 0 and enter the variance correction.

    Scale shape: same as Theil–Sen — ONE key-clustered self-join forms
    the pairs (per-key quadratic, corpus-linear across keys), tie groups
    from one (key, value) aggregate, and ``max_points_per_key`` is the
    identical deterministic stride cap (same ``row_number() over
    (key ORDER BY t, v)`` rule, so capped runs reproduce exactly).
    """
    from ..functions.dates import epoch_seconds

    a = df.select(
        F.col(key_col).alias("_k"),
        epoch_seconds(F.col(ts_col)).alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_v").isNotNull() & F.col("_t").isNotNull())
    if max_points_per_key is not None:
        from pyspark.sql import Window as W

        w = W.partitionBy("_k")
        rn = F.row_number().over(w.orderBy("_t", "_v"))
        n_k = F.count(F.lit(1)).over(w)
        stride = F.ceil(n_k / F.lit(max_points_per_key))
        a = (
            a.withColumn("_rn", rn)
            .withColumn("_stride", stride)
            .filter((F.col("_rn") - 1) % F.col("_stride") == 0)
            .drop("_rn", "_stride")
        )
    b = a.select(
        F.col("_k"), F.col("_t").alias("_t2"), F.col("_v").alias("_v2")
    )
    s = (
        a.join(b, "_k")
        .filter(F.col("_t2") > F.col("_t"))
        .groupBy("_k")
        .agg(
            F.sum(F.signum(F.col("_v2") - F.col("_v")))
            .cast("long")
            .alias("_s")
        )
    )
    n_t = F.count(F.lit(1)).cast("long")
    ties = (
        a.groupBy("_k", "_v")
        .agg(n_t.alias("_tg"))
        .groupBy("_k")
        .agg(
            F.sum("_tg").cast("long").alias("_n"),
            F.sum(
                F.col("_tg") * (F.col("_tg") - 1) * (2 * F.col("_tg") + 5)
            )
            .cast("long")
            .alias("_tie_term"),
        )
    )
    n = F.col("_n").cast("double")
    var_s = (
        n * (n - 1) * (2 * n + 5) - F.col("_tie_term").cast("double")
    ) / F.lit(18.0)
    sd = F.col("_s").cast("double")
    z = (
        F.when(F.col("_var") <= 0, F.lit(0.0))
        .when(sd > 0, (sd - 1) / F.sqrt("_var"))
        .when(sd < 0, (sd + 1) / F.sqrt("_var"))
        .otherwise(F.lit(0.0))
    )
    return (
        s.join(ties, "_k")
        .withColumn("_var", var_s)
        .select(
            F.col("_k").alias(key_col),
            F.col("_n").alias("n_points"),
            F.col("_s").alias("s_stat"),
            (F.round(z, round_digits) + F.lit(0.0)).alias("z"),
        )
    )


def acf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    max_lag: int = 3,
    round_digits: int = 4,
) -> DataFrame:
    """Per-group sample autocorrelation function at lags ``1..max_lag``
    over the time-ordered series:
    ``r_L = Σ_{t≤n−L}(x_t − x̄)(x_{t+L} − x̄) / Σ_t(x_t − x̄)²``
    (the standard biased estimator — one shared denominator, so the ACF
    is a proper positive-semidefinite sequence). The seasonality /
    memory detector that tells a pipeline whether per-entity telemetry
    is white noise or worth a seasonal model.

    Returns ``(key, lag, n_points, acf_val)``; keys with zero variance
    are dropped (ACF undefined). Determinism: positions come from
    ``row_number() over (key ORDER BY t, v)`` (total order), the mean is
    an exact DECIMAL sum divided once, every per-row product is a
    deterministic double, and products are CAST to DECIMAL(38,12) before
    summing — order-independent accumulation on both engines.

    Scale shape: one window ranks each key's history, ONE range self-join
    (``0 < rn_b − rn_a ≤ max_lag``) forms all lag pairs — fanout is
    ``max_lag`` rows per point, not quadratic — and two key-keyed
    aggregates finish. No driver state, no global window.
    """
    from pyspark.sql import Window as W

    from ..functions.dates import epoch_seconds

    a = (
        df.select(
            F.col(key_col).alias("_k"),
            epoch_seconds(F.col(ts_col)).alias("_t"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .filter(F.col("_v").isNotNull() & F.col("_t").isNotNull())
        .withColumn(
            "_rn",
            F.row_number().over(W.partitionBy("_k").orderBy("_t", "_v")),
        )
        .select("_k", "_rn", "_v")
    )
    stats = a.groupBy("_k").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        (
            F.sum(F.col("_v").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_mean"),
    )
    # r14: _n already rides centered, so the final re-join against
    # stats (a whole extra scan+aggregate subtree) is replaced by
    # max(_n) in the lag aggregate (constant per key — exact).
    # Measured and NOT taken: a lazy checkpoint of centered (it feeds
    # three consumers) — storing the events-sized centered rows cost
    # more than the recompute it saved (pacf 3.67 -> 4.73 s A/B; the
    # consumers are narrow aggregates over a cheap scan+window chain).
    centered = a.join(stats, "_k").select(
        "_k",
        "_rn",
        "_n",
        "_mean",
        (F.col("_v") - F.col("_mean")).alias("_c"),
    )
    denom = centered.groupBy("_k").agg(
        F.sum((F.col("_c") * F.col("_c")).cast("decimal(38,12)")).alias("_den")
    )
    b = centered.select(
        F.col("_k"), F.col("_rn").alias("_rn2"), F.col("_c").alias("_c2")
    )
    num = (
        centered.join(b, "_k")
        .filter(
            (F.col("_rn2") > F.col("_rn"))
            & (F.col("_rn2") - F.col("_rn") <= max_lag)
        )
        .groupBy("_k", (F.col("_rn2") - F.col("_rn")).alias("lag"))
        .agg(
            F.sum((F.col("_c") * F.col("_c2")).cast("decimal(38,12)")).alias(
                "_num"
            ),
            F.max("_n").alias("_n"),
        )
    )
    return (
        num.join(denom, "_k")
        .filter(F.col("_den") > 0)
        .select(
            F.col("_k").alias(key_col),
            F.col("lag").cast("long").alias("lag"),
            F.col("_n").alias("n_points"),
            (
                F.round(
                    F.col("_num").cast("double") / F.col("_den").cast("double"),
                    round_digits,
                )
                + F.lit(0.0)
            ).alias("acf_val"),
        )
    )


def holt_linear_smoothing(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    min_points: int = 3,
) -> DataFrame:
    """Holt's double exponential smoothing per key (level + trend; the
    non-seasonal core of Holt-Winters): the standard short-horizon
    forecaster one notch up from :func:`windowed_ewma` (which has no
    trend state and lags ramps). Returns per key
    ``(key, n_points, level, trend, forecast_1)`` — the final smoothed
    level/trend and the one-step-ahead forecast ``level + trend``.

        l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    initialized l_1 = y_1, b_1 = y_2 − y_1 (standard), observations in
    strict (ts, id) order.

    Determinism: the recursion runs in scalar IEEE doubles with a fixed
    expression shape, so an engine replaying the identical update order
    (the oracle's recursive CTE) reproduces it bit-for-bit; outputs are
    rounded (level/forecast 4 dp, trend 6 dp).

    Scale shape: inherently sequential IN t but embarrassingly parallel
    ACROSS keys — one ``applyInPandas`` over key groups (per-key state
    is two floats; group size = series length, the same per-key bound
    Theil-Sen documents, with resampling as the documented cap for
    pathological keys). NULL values are skipped (carried over, the
    standard treatment).
    """
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    a = float(alpha)
    b = float(beta)
    out_schema = StructType(
        [
            StructField("k", StringType()),
            StructField("n_points", LongType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("forecast_1", DoubleType()),
        ]
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_us", "_id"])
        ys = [float(v) for v in pdf["_v"] if v is not None and v == v]
        if len(ys) < min_points:
            return pd.DataFrame(
                {"k": [], "n_points": [], "level": [], "trend": [],
                 "forecast_1": []}
            )
        level = ys[0]
        trend = ys[1] - ys[0]
        for y in ys[1:]:
            prev = level
            level = a * y + (1.0 - a) * (level + trend)
            trend = b * (level - prev) + (1.0 - b) * trend
        return pd.DataFrame(
            {
                "k": [str(pdf["_k"].iloc[0])],
                "n_points": [len(ys)],
                "level": [round(level, 4) + 0.0],
                "trend": [round(trend, 6) + 0.0],
                "forecast_1": [round(level + trend, 4) + 0.0],
            }
        )

    return (
        df.select(
            F.col(key_col).cast("string").alias("_k"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
            F.col(id_col).alias("_id"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .groupBy("_k")
        .applyInPandas(smooth, schema=out_schema)
        .select(
            F.col("k").alias(key_col),
            "n_points",
            "level",
            "trend",
            "forecast_1",
        )
    )


def seasonal_decompose(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    period: int = 24,
    ma_window: int = 25,
    round_digits: int = 4,
) -> DataFrame:
    """Classical additive seasonal decomposition of the hourly total
    series: per phase-of-period row ``(phase, n_obs, seasonal_idx)``.

    The moving-average decomposition behind every "is Tuesday 3 pm
    always like this" question: bucket to hours, detrend with a
    centered ``ma_window``-point moving average (odd window, FULL
    windows only — partial edges would bias the trend), then average
    the detrended residual by phase = hour-of-period. Complements
    ``seasonal_baseline_backtest`` (which scores forecasts) by
    exposing the seasonal component itself.

    Determinism is the integer-micros trick used across this module:
    hourly sums accumulate as BIGINT micros; the detrended value is
    kept as the EXACT integer ``w·y − Σwindow`` (avoiding the division
    by w entirely), and only the final per-phase average divides —
    one double expression over exact integer sums, rounded. Shape: one
    hour-keyed aggregate over the facts (the only fact-sized shuffle),
    one ``ma_window``-frame window over the hourly series (series-
    sized, thousands of rows), one ``period``-keyed aggregate.
    """
    from pyspark.sql import Window

    from ..functions.dates import epoch_seconds

    assert ma_window % 2 == 1, "centered MA needs an odd window"
    half = ma_window // 2
    hourly = (
        df.select(
            (F.floor(epoch_seconds(F.col(ts_col)) / 3600))
            .cast("bigint")
            .alias("_h"),
            F.round(F.col(value_col).cast("double") * 1e6)
            .cast("bigint")
            .alias("_v"),
        )
        .groupBy("_h")
        .agg(F.sum("_v").alias("_y"))
    )
    w = Window.orderBy("_h").rowsBetween(-half, half)
    detr = hourly.select(
        (F.col("_h") % period).alias("phase"),
        F.when(
            F.count(F.lit(1)).over(w) == ma_window,
            F.lit(ma_window) * F.col("_y") - F.sum("_y").over(w),
        ).alias("_d"),
    ).filter(F.col("_d").isNotNull())
    return detr.groupBy("phase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        (
            F.round(
                F.sum("_d").cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(float(ma_window))
                / 1e6,
                round_digits,
            )
            + 0.0
        ).alias("seasonal_idx"),
    )


def decayed_score(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    half_life_hours: float = 24.0,
    anchor_epoch: int | None = None,
) -> DataFrame:
    """Per-key exponentially time-decayed score at an anchor instant:
    ``(key, n_events, decayed_score)`` with score = Σ value·2^(−Δt/h),
    Δt = anchor − event time, h = the half-life.

    The recency-weighted engagement/trust signal behind "hot sources",
    freshness-aware sampling weights, and decayed reputation — a
    STATELESS one-pass alternative to row-ordered EWMA
    (``windowed_ewma``): no window, no per-key sort, just a map-side
    term and ONE key-clustered aggregate, so it distributes like a
    plain groupBy at any key cardinality and any history length.

    Determinism: each row's term value·2^(−Δt/h) is one double
    expression on integer inputs, quantized to BIGINT picos BEFORE the
    sum — the aggregate is exact integer addition (order-independent
    across engines/partitions), and the final score is one rounded
    division. ``anchor_epoch`` must be supplied by the caller for
    reproducible runs (defaulting to max(ts) would add a scan).
    """
    from ..functions.dates import epoch_seconds

    assert anchor_epoch is not None, "pass an explicit anchor for reproducibility"
    dt = F.lit(int(anchor_epoch)) - epoch_seconds(F.col(ts_col))
    term = F.col(value_col).cast("double") * F.pow(
        F.lit(2.0), -(dt.cast("double") / F.lit(float(half_life_hours) * 3600.0))
    )
    pico = F.round(term * 1e12).cast("bigint")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(key_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (F.round(F.sum(pico).cast("double") / 1e12, 6) + 0.0).alias(
                "decayed_score"
            ),
        )
    )


def interevent_stats(
    df: DataFrame, key_col: str, ts_col: str, tiebreak_col: str
) -> DataFrame:
    """Per-key inter-event-gap statistics: ``(key, n_gaps, mean_gap_s,
    cv, burstiness)`` with burstiness B = (sigma - mu)/(sigma + mu)
    (Goh & Barabasi 2008) — B near -1 is a regular pulse, near 0 a
    Poisson process, toward +1 a bursty heavy-tailed stream.

    The traffic-shape fingerprint behind bot detection, session-gap
    tuning, and rate-limit budgeting. Gaps come from one lag() over the
    per-key time sort (tiebreak makes equal timestamps deterministic)
    in exact integer seconds; mean and variance derive from the exact
    sums (n, sum g, sum g^2) — one window pass + one key aggregate, both
    clustered on the key. Keys with fewer than 2 events drop (no gap);
    a zero-mean (all simultaneous) key reports NULL cv/burstiness.
    """
    from pyspark.sql import Window

    from ..functions.dates import epoch_seconds

    w = Window.partitionBy(key_col).orderBy(
        epoch_seconds(F.col(ts_col)), F.col(tiebreak_col)
    )
    gaps = df.select(
        F.col(key_col),
        (
            epoch_seconds(F.col(ts_col))
            - F.lag(epoch_seconds(F.col(ts_col))).over(w)
        )
        .cast("bigint")
        .alias("_g"),
    ).filter(F.col("_g").isNotNull())
    agg = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("_g").alias("_s1"),
        F.sum(F.col("_g") * F.col("_g")).alias("_s2"),
    )
    n = F.col("n_gaps").cast("double")
    mu = F.col("_s1").cast("double") / n
    var = F.greatest(
        F.col("_s2").cast("double") / n - mu * mu, F.lit(0.0)
    )
    sd = F.sqrt(var)
    return agg.select(
        F.col(key_col),
        "n_gaps",
        (F.round(mu, 6) + 0.0).alias("mean_gap_s"),
        (
            F.round(F.when(F.col("_s1") > 0, sd / mu), 6) + 0.0
        ).alias("cv"),
        (
            F.round(
                F.when(F.col("_s1") > 0, (sd - mu) / (sd + mu)), 6
            )
            + 0.0
        ).alias("burstiness"),
    )


def time_weighted_average(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    end_ts: str,
) -> DataFrame:
    """Time-weighted average per key over irregularly-sampled
    observations (TWAP): last-observation-carried-forward from each
    sample to the next, integrated from the key's FIRST observation to
    ``end_ts`` — the correct "average price/level over the window"
    when sampling is irregular (a plain AVG over-weights bursty
    periods; financial TWAP, telemetry gauges, inventory levels).

    Observations at/after ``end_ts`` (an ISO timestamp string, same
    wall-clock semantics as the data) and NULL values are excluded.
    Returns ``(key, n_obs, span_us, twap)`` per key with >= 1
    observation; a zero-length span (single observation exactly at the
    window end) reports that observation's value.

    Determinism: values quantize to integer 1e-4 units and durations
    are exact integer MICROSECONDS; each segment's value x duration
    product accumulates in DECIMAL(38,0) (exact in any order), with
    one final double division. Shape: one key-clustered lead() window
    + one key aggregate — the same single shuffle any per-key
    sessionization pays.
    """
    end_us = F.unix_micros(F.lit(end_ts).cast("timestamp"))
    base = df.select(
        F.col(key_col).alias("key"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_t"),
        F.round(F.col(value_col).cast("double") * 1e4)
        .cast("bigint")
        .alias("_vq"),
    ).filter(
        F.col("_vq").isNotNull() & (F.col("_t") <= end_us)
    )
    w = Window.partitionBy("key").orderBy("_t", "_vq")
    seg = base.withColumn(
        "_tn", F.coalesce(F.lead("_t").over(w), end_us)
    ).withColumn("_dur", F.col("_tn") - F.col("_t"))
    agg = seg.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum(
            (F.col("_vq").cast("decimal(38,0)") * F.col("_dur")).cast(
                "decimal(38,0)"
            )
        ).alias("_area"),
        F.sum("_dur").cast("bigint").alias("span_us"),
        F.max(F.struct("_t", "_vq")).alias("_last"),
    )
    twap = F.when(
        F.col("span_us") > 0,
        F.col("_area").cast("double") / 1e4 / F.col("span_us").cast("double"),
    ).otherwise(F.col("_last._vq") / 1e4)
    return agg.select(
        "key",
        "n_obs",
        "span_us",
        (F.round(twap, 6) + 0.0).alias("twap"),
    )


def cusum_flags(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    slack: float = 0.5,
    threshold: float = 4.0,
    max_points_per_key: int = 512,
) -> DataFrame:
    """Per-key two-sided CUSUM drift detection (Page 1954): standardize
    each key's series against its OWN mean/std, run the cumulative-sum
    recursions ``S+ = max(0, S+ + z - slack)`` / ``S- = max(0, S- - z -
    slack)``, and flag keys whose max excursion crosses ``threshold``
    (in σ units) — the classic sequential changepoint detector, the
    sustained-shift complement to :func:`mean_shift_scores` (single
    split point) and ``rolling_zscore_outliers`` (pointwise spikes):
    CUSUM accumulates many small same-direction deviations a pointwise
    z never sees.

    Returns one row per key: ``(key, n_points, max_cusum_pos,
    max_cusum_neg, drifted)``; keys with < 2 points or zero variance
    report 0 excursions (no evidence, not NULL-poisoned).

    Scale shape: per-key DECIMAL moment sums (exact, order-free) and a
    ``collect_list`` of (ts, id, value) structs happen in ONE key-keyed
    aggregate; the CUSUM fold runs inside ``F.aggregate`` over the
    ``array_sort``-ed struct array — row-local, codegen'd, no Python.
    The recursion is inherently sequential per key, so per-key history
    is the memory bound: ``max_points_per_key`` truncates to the
    EARLIEST points by (ts, id) (deterministic; the kendall_tau cap
    convention). At 100 TB: millions of keys fold in parallel, each
    bounded; an unbounded-history key needs the streaming CUSUM shape
    (applyInPandasWithState) instead.

    Determinism: the fold order is pinned by ``array_sort`` on (ts,
    id); mean/std come from exact DECIMAL sums; every fold step is the
    same IEEE double expression a SQL oracle replays in the same order
    — outputs round 6 dp.
    """
    dec = "decimal(38,12)"
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_t"),
        F.col(id_col).alias("_i"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_k").isNotNull() & F.col("_v").isNotNull())
    # cap BEFORE the moments so the standardization and the fold see the
    # same points (a per-key window — partitioned, scale-safe)
    wk = Window.partitionBy("_k").orderBy("_t", "_i")
    capped = base.withColumn("_rn", F.row_number().over(wk)).filter(
        F.col("_rn") <= max_points_per_key
    )
    per = capped.groupBy("_k").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(F.col("_v").cast(dec)).alias("_s"),
        F.sum((F.col("_v").cast(dec) * F.col("_v").cast(dec)).cast(dec)).alias(
            "_q"
        ),
        F.array_sort(F.collect_list(F.struct("_t", "_i", "_v"))).alias(
            "_pts"
        ),
    )
    n = F.col("_n").cast("double")
    mean = F.col("_s").cast("double") / n
    var = F.when(
        F.col("_n") > 1,
        (F.col("_q").cast("double") - F.col("_s").cast("double") * F.col("_s").cast("double") / n)
        / (n - 1.0),
    ).otherwise(F.lit(0.0))
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    k = float(slack)
    state0 = F.struct(
        F.lit(0.0).alias("sp"),
        F.lit(0.0).alias("sn"),
        F.lit(0.0).alias("mp"),
        F.lit(0.0).alias("mn"),
    )

    def step(acc, p):
        z = (p["_v"] - F.col("_mean")) / F.col("_sd")
        sp = F.greatest(F.lit(0.0), acc["sp"] + z - F.lit(k))
        sn = F.greatest(F.lit(0.0), acc["sn"] - z - F.lit(k))
        return F.struct(
            sp.alias("sp"),
            sn.alias("sn"),
            F.greatest(acc["mp"], sp).alias("mp"),
            F.greatest(acc["mn"], sn).alias("mn"),
        )

    folded = per.select(
        "_k",
        "_n",
        mean.alias("_mean"),
        sd.alias("_sd"),
        "_pts",
    ).select(
        "_k",
        "_n",
        F.when(
            (F.col("_n") > 1) & (F.col("_sd") > 0.0),
            F.aggregate(F.col("_pts"), state0, step),
        ).alias("_st"),
    )
    return folded.select(
        F.col("_k").alias(key_col),
        F.col("_n").alias("n_points"),
        (
            F.round(F.coalesce(F.col("_st.mp"), F.lit(0.0)), 6) + 0.0
        ).alias("max_cusum_pos"),
        (
            F.round(F.coalesce(F.col("_st.mn"), F.lit(0.0)), 6) + 0.0
        ).alias("max_cusum_neg"),
        (
            F.coalesce(
                F.greatest(F.col("_st.mp"), F.col("_st.mn"))
                > F.lit(float(threshold)),
                F.lit(False),
            )
        ).alias("drifted"),
    )


def ljung_box(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Per-key Ljung-Box portmanteau statistic (Ljung & Box 1978):
    ``Q = n(n+2) * sum_{L=1..h} r_L^2 / (n-L)`` over the first ``h``
    sample autocorrelations — the "is this series white noise at all?"
    pre-test a pipeline runs before fitting any seasonal/AR model to
    per-entity telemetry (compare Q to a chi-square(h) critical value
    downstream; the engine emits the exact statistic, not a p-value,
    because neither Spark nor the SQL oracle has an inverse chi-square).

    Returns one row per key: ``(key, n_points, n_lags, q_stat)`` —
    ``n_lags`` is the number of lags actually available (short series
    have fewer than ``max_lag``), keys with zero variance are dropped
    (ACF undefined, inherited from :func:`acf`).

    Built directly on :func:`acf` (one ranking window + one bounded
    range self-join, no global state), then a key-keyed reduction.
    Determinism: each ``r_L`` is the 4-dp cross-engine-exact ACF value;
    each summand ``r_L^2/(n-L)`` is quantized to integer picos BEFORE
    the per-key sum (order-free integer accumulation on both engines);
    the final Q is one double expression rounded 4 dp.
    """
    r = acf(df, key_col, ts_col, value_col, max_lag=max_lag, round_digits=4)
    term = F.round(
        (F.col("acf_val") * F.col("acf_val"))
        / (F.col("n_points") - F.col("lag")).cast("double")
        * F.lit(1e12)
    ).cast("bigint")
    return (
        r.filter(F.col("lag") < F.col("n_points"))
        .groupBy(F.col(key_col))
        .agg(
            F.max("n_points").cast("bigint").alias("n_points"),
            F.count(F.lit(1)).cast("bigint").alias("n_lags"),
            F.sum(term).alias("_sp"),
        )
        .select(
            key_col,
            "n_points",
            "n_lags",
            (
                F.round(
                    F.col("n_points").cast("double")
                    * (F.col("n_points") + 2).cast("double")
                    * (F.col("_sp").cast("double") / F.lit(1e12)),
                    4,
                )
                + 0.0
            ).alias("q_stat"),
        )
    )


def page_hinkley(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    delta: float = 0.05,
    threshold: float = 2.0,
) -> DataFrame:
    """Per-key Page-Hinkley drift test (Page 1954 / Mouss et al. 2004):
    with the RUNNING mean ``m_t = avg(x_1..x_t)``, accumulate
    ``U_t = sum_{s<=t} (x_s - m_s - delta)`` and monitor the excursion
    ``PH_t = U_t - min_{s<=t} U_s``; an upward level shift makes recent
    terms positive and PH grows past ``threshold``. The online-drift
    sibling of :func:`cusum_flags`: CUSUM standardizes against the
    GLOBAL key mean (needs the whole history's moments), Page-Hinkley
    self-normalizes against the running mean — the shape you can also
    run incrementally.

    Returns one row per key: ``(key, n_points, ph_max, drifted,
    first_cross_n)`` — ``first_cross_n`` is the 1-based observation
    index of the first threshold crossing (NULL if none).

    Scale shape: three per-key windows (running sum, running min,
    running max — all ``partitionBy(key)``, never global) over the
    (ts, id)-ranked series; no driver state, no fold, no cap needed
    because windows stream within a partition. Determinism: values
    quantize to integer micros, the running-mean subtraction is ONE
    double division of exact integers rounded back to integer nanos
    per term, so every cumulative quantity both engines compare is an
    exact BIGINT; ph_max rounds 6 dp.
    """
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_t"),
        F.col(id_col).alias("_i"),
        F.round(F.col(value_col).cast("double") * 1e6).cast("bigint").alias(
            "_vu"
        ),
    ).filter(F.col("_k").isNotNull() & F.col("_vu").isNotNull())
    wk = Window.partitionBy("_k").orderBy("_t", "_i")
    wcum = wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = base.select(
        "_k",
        "_vu",
        F.row_number().over(wk).alias("_rn"),
        F.sum("_vu").over(wcum).alias("_su"),
    )
    # after ranking, (_k, _rn) IS the order — later windows key on it
    wrn = Window.partitionBy("_k").orderBy("_rn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # term_n (nanos) = x_t - m_t - delta, m_t = running mean of exact micros
    term = F.round(
        F.col("_vu").cast("double") * 1e3
        - F.col("_su").cast("double") * 1e3 / F.col("_rn").cast("double")
        - F.lit(float(delta) * 1e9)
    ).cast("bigint")
    cum = ranked.select(
        "_k",
        "_rn",
        F.sum(term).over(wrn).alias("_u"),
    )
    ph = cum.select(
        "_k",
        "_rn",
        (F.col("_u") - F.min("_u").over(wrn)).alias("_ph"),
    )
    thr = int(round(float(threshold) * 1e9))
    return ph.groupBy(F.col("_k").alias(key_col)).agg(
        F.max("_rn").cast("bigint").alias("n_points"),
        (F.round(F.max("_ph") / 1e9, 6) + 0.0).alias("ph_max"),
        (F.max("_ph") > thr).alias("drifted"),
        F.min(F.when(F.col("_ph") > thr, F.col("_rn")))
        .cast("bigint")
        .alias("first_cross_n"),
    )


def best_sse_split(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    min_segment: int = 2,
) -> DataFrame:
    """Per-key single best changepoint by SSE reduction (the first step
    of binary segmentation, Scott & Knott 1974): over the time-ordered
    series, pick the split position ``i`` (left = first i points) that
    maximizes the between-segment gain ``G(i) = SL^2/i + SR^2/(n-i) -
    S^2/n`` — algebraically the drop in total squared error when one
    mean becomes two. The offline "WHERE did the regime change"
    complement to the sequential detectors (:func:`cusum_flags`,
    :func:`page_hinkley` say *whether/when detected*; this says the
    least-squares best split).

    Returns one row per key with ``n >= 2*min_segment`` points:
    ``(key, n_points, split_pos, mean_left, mean_right, gain)`` —
    ``split_pos`` is 1-based (left segment = rows 1..split_pos), ties
    on gain break to the SMALLEST split (deterministic).

    Scale shape: one per-key ranking window + one per-key running sum
    (both ``partitionBy(key)``), then a per-key argmax via
    ``row_number`` over (gain desc, pos asc) — every stage is keyed,
    nothing global, no self-join (the candidate set IS the point set).
    Determinism: values quantize to integer micros so SL/SR/S are exact
    BIGINTs; G is the same IEEE double expression of those integers on
    both engines; means and gain round 6 dp.
    """
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_t"),
        F.col(id_col).alias("_i"),
        F.round(F.col(value_col).cast("double") * 1e6).cast("bigint").alias(
            "_vu"
        ),
    ).filter(F.col("_k").isNotNull() & F.col("_vu").isNotNull())
    wk = Window.partitionBy("_k").orderBy("_t", "_i")
    wcum = wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("_k")
    # _s must be the TRUE per-key total sum(_vu) — NOT max(_sl), which
    # equals the total only when every prefix sum is <= the final one
    # (i.e. nonnegative tails). With negative values after the prefix-sum
    # peak, max(_sl) overstates S and silently corrupts mean_right/gain.
    ranked = base.select(
        "_k",
        F.row_number().over(wk).alias("_rn"),
        F.sum("_vu").over(wcum).alias("_sl"),
        F.count(F.lit(1)).over(wall).alias("_n"),
        F.sum("_vu").over(wall).alias("_s"),
    )
    cand = ranked.filter(
        (F.col("_n") >= 2 * min_segment)
        & (F.col("_rn") >= min_segment)
        & (F.col("_rn") <= F.col("_n") - min_segment)
    )
    i = F.col("_rn").cast("double")
    n = F.col("_n").cast("double")
    sl = F.col("_sl").cast("double")
    sr = (F.col("_s") - F.col("_sl")).cast("double")
    s = F.col("_s").cast("double")
    gain = (
        sl * sl / i + sr * sr / (n - i) - s * s / n
    ) / F.lit(1e12)  # micros^2 -> value units^2
    scored = cand.select(
        "_k", "_rn", "_n", "_sl", "_s", gain.alias("_g")
    ).withColumn(
        "_pick",
        F.row_number().over(
            Window.partitionBy("_k").orderBy(
                F.col("_g").desc(), F.col("_rn").asc()
            )
        ),
    )
    return scored.filter(F.col("_pick") == 1).select(
        F.col("_k").alias(key_col),
        F.col("_n").cast("bigint").alias("n_points"),
        F.col("_rn").cast("bigint").alias("split_pos"),
        (
            F.round(F.col("_sl") / (F.col("_rn") * F.lit(1e6)), 6) + 0.0
        ).alias("mean_left"),
        (
            F.round(
                (F.col("_s") - F.col("_sl"))
                / ((F.col("_n") - F.col("_rn")) * F.lit(1e6)),
                6,
            )
            + 0.0
        ).alias("mean_right"),
        (F.round(F.col("_g"), 6) + 0.0).alias("gain"),
    )


def pacf_dl(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Per-group partial autocorrelation at lags ``1..max_lag`` via the
    Durbin-Levinson recursion over the sample ACF — the AR-order
    diagnostic that complements :func:`acf`: ACF says "is there
    memory?", PACF says "how many AR lags explain it" (the PACF of an
    AR(p) process cuts off after lag p; Box & Jenkins 1970).

    Returns ``(key, lag, pacf_val)`` for every lag ``1..m`` where m is
    the longest consecutive ACF prefix the key supports (keys need
    ``n_points > lag`` and nonzero variance — :func:`acf`'s own
    contract). Degenerate recursion steps (``|1 - Σ φ_j r_j| = 0``)
    stop the ladder early.

    Determinism: the ACF is computed at 12-dp quantization (exact
    DECIMAL machinery, one rounded double per lag — identical on both
    engines), and the recursion is plain IEEE doubles applied in a
    FIXED textbook order (``num = r_m - φ_1 r_{m-1} - … ``,
    left-to-right), so an oracle spelling out the same closed-form
    steps reproduces it bit-for-bit. Shape: the corpus cost IS the acf
    call (one ranking window + one bounded-fanout self-join); the
    recursion then runs per key on ≤ max_lag rows via one grouped
    Arrow batch — model-sized, never data-sized.
    """
    import pandas as pd
    from decimal import ROUND_HALF_UP, Decimal

    r = acf(df, key_col, ts_col, value_col, max_lag, round_digits=12)
    key_field = r.schema[key_col].dataType.simpleString()

    def _round6_half_up(x: float) -> float:
        # Python round() is banker's (half-to-even) while the DuckDB
        # oracle round() and every F.round in the repo are HALF_UP on
        # the double's shortest decimal repr — an exact 6-dp half-tie
        # in phi_mm would hash-mismatch under round() (ADVICE r10).
        # Decimal(repr(x)) reproduces the same shortest-repr base both
        # engines quantize from.
        return float(
            Decimal(repr(x)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("lag")
        lags = pdf["lag"].tolist()
        rv = {int(l): float(v) for l, v in zip(pdf["lag"], pdf["acf_val"])}
        key = pdf[key_col].iloc[0]
        # longest consecutive prefix 1..m
        m = 0
        while (m + 1) in rv:
            m += 1
        out_lag, out_val = [], []
        phi: dict[int, float] = {}
        for step in range(1, m + 1):
            if step == 1:
                phi_mm = rv[1]
            else:
                num = rv[step]
                den = 1.0
                for j in range(1, step):
                    num -= phi[j] * rv[step - j]
                    den -= phi[j] * rv[j]
                if den == 0.0:
                    break
                phi_mm = num / den
            new_phi = {}
            for j in range(1, step):
                new_phi[j] = phi[j] - phi_mm * phi[step - j]
            new_phi[step] = phi_mm
            phi = new_phi
            out_lag.append(step)
            out_val.append(_round6_half_up(phi_mm) + 0.0)
        return pd.DataFrame(
            {key_col: [key] * len(out_lag), "lag": out_lag,
             "pacf_val": out_val}
        )

    return (
        r.select(key_col, "lag", "acf_val")
        .groupBy(key_col)
        .applyInPandas(
            per_key,
            schema=f"{key_col} {key_field}, lag long, pacf_val double",
        )
    )


def durbin_watson(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Durbin-Watson statistic per key over the residuals of the key's
    own OLS line (value on epoch time):
    ``DW = Σ_{t≥2}(e_t − e_{t−1})² / Σ e_t²`` — the classic lag-1
    serial-correlation diagnostic for a fitted trend (DW ≈ 2 means
    uncorrelated residuals; → 0 positive, → 4 negative correlation),
    complementing :func:`acf` (raw series) and the runs test
    (distribution-free). Keys need ≥ 3 points and nonzero time
    variance; degenerate keys report NULL.

    Determinism: OLS sufficient statistics accumulate in exact
    DECIMAL(38) (the groupwise_trend recipe), slope/intercept are
    one-shot doubles, each residual quantizes to integer micro-units,
    and numerator/denominator are exact integer sums — engine-identical
    in any aggregation order. Shape: one keyed aggregate for the fit,
    a broadcast-back residual pass, one key-partitioned window lag, one
    keyed aggregate — no global window, no driver state.
    """
    from pyspark.sql import Window as W

    from ..functions.dates import epoch_seconds

    base = df.select(
        F.col(key_col).alias("_k"),
        epoch_seconds(F.col(ts_col)).alias("_t"),
        F.round(F.col(value_col).cast("double") * 1e6)
        .cast("bigint")
        .alias("_vq"),
    ).filter(F.col("_vq").isNotNull() & F.col("_t").isNotNull())
    # OLS sufficient statistics over exact INTEGER (t, micro-value)
    # pairs — every sum is an exact decimal of integers, so the fitted
    # line is one identical double expression on both engines (the
    # decimal-product scale rules for fractional t*v differ between
    # engines; integers sidestep them entirely)
    fit = base.groupBy("_k").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(F.col("_t").cast("decimal(38,0)")).alias("_st"),
        F.sum(F.col("_vq").cast("decimal(38,0)")).alias("_sv"),
        F.sum(
            (F.col("_t").cast("decimal(38,0)") * F.col("_t")).cast(
                "decimal(38,0)"
            )
        ).alias("_stt"),
        F.sum(
            (F.col("_t").cast("decimal(38,0)") * F.col("_vq")).cast(
                "decimal(38,0)"
            )
        ).alias("_stv"),
    )
    nd = F.col("_n").cast("double")
    det = nd * F.col("_stt").cast("double") - F.col("_st").cast("double") * F.col(
        "_st"
    ).cast("double")
    slope = F.when(
        (F.col("_n") >= 3) & (det != 0.0),
        (
            nd * F.col("_stv").cast("double")
            - F.col("_st").cast("double") * F.col("_sv").cast("double")
        )
        / det,
    )
    fitted = fit.select(
        "_k", "_n",
        slope.alias("_b"),
        (
            (F.col("_sv").cast("double") - slope * F.col("_st").cast("double"))
            / nd
        ).alias("_a"),
    ).filter(F.col("_b").isNotNull())
    # residuals stay in micro-units: e = vq - a - b*t (a, b are in
    # micro-value space already), rounded to exact integers
    resid = base.join(F.broadcast(fitted), "_k").select(
        "_k", "_t", "_vq", "_n",
        F.round(
            F.col("_vq").cast("double")
            - F.col("_a")
            - F.col("_b") * F.col("_t").cast("double")
        )
        .cast("bigint")
        .alias("_e"),
    )
    w = W.partitionBy("_k").orderBy("_t", "_vq")
    stepped = resid.select(
        "_k", "_n", "_e",
        F.lag("_e").over(w).alias("_ep"),
    )
    agg = stepped.groupBy("_k", "_n").agg(
        F.sum(
            F.when(
                F.col("_ep").isNotNull(),
                (
                    (F.col("_e") - F.col("_ep")).cast("decimal(38,0)")
                    * (F.col("_e") - F.col("_ep"))
                ).cast("decimal(38,0)"),
            )
        ).alias("_num"),
        F.sum(
            (F.col("_e").cast("decimal(38,0)") * F.col("_e")).cast(
                "decimal(38,0)"
            )
        ).alias("_den"),
    )
    return agg.select(
        F.col("_k").alias(key_col),
        F.col("_n").alias("n_points"),
        (
            F.round(
                F.when(
                    F.col("_den") > 0,
                    F.col("_num").cast("double") / F.col("_den").cast("double"),
                ),
                6,
            )
            + 0.0
        ).alias("dw_stat"),
    )


def hurst_aggvar(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    base_seconds: int = 3600,
    n_scales: int = 6,
) -> DataFrame:
    """Hurst exponent via the AGGREGATED-VARIANCE method (Beran 1994;
    Taqqu, Teverovsky & Willinger 1995): bucket the series at widths
    ``base·2^j`` for ``j = 0..n_scales−1``, take the variance of the
    bucket MEANS at each width, and fit ``ln Var ~ ln width`` — for a
    long-range-dependent process ``Var(X̄_m) ∝ m^{2H−2}``, so
    ``H = 1 + slope/2``. H ≈ 0.5 is memoryless; H → 1 means strong
    persistence (load/traffic series almost always show it, and
    ignoring it makes every naive confidence interval too tight — the
    long-memory cousin of the :func:`acf`/:func:`ljung_box` readouts).

    Returns ONE row ``(n_scales_used, hurst, slope, r2)``; NULL stats
    when fewer than 2 scales have ≥ 2 buckets (slope undefined).

    Determinism: bucket means are exact DECIMAL sums / counts; each
    mean micro-quantizes to integer units so the per-scale variance
    reduces over exact integers (the welch_t moment recipe); the
    log-log fit is :func:`stats.ols_xy`'s quantized
    sufficient-statistics recipe over ≤ ``n_scales`` points. Shape:
    ONE corpus pass — explode each row into its ``n_scales`` (scale,
    bucket) cells (bounded ×n_scales row growth), one (scale, bucket)
    groupBy, one n_scales-row reduction. Events need no global order:
    bucketing is pure epoch arithmetic.
    """
    from ..functions.dates import epoch_seconds
    from .stats import ols_xy

    if n_scales < 2:
        raise ValueError("hurst_aggvar: need n_scales >= 2")
    widths = [int(base_seconds) * (2 ** j) for j in range(n_scales)]
    base = df.select(
        epoch_seconds(F.col(ts_col)).alias("_sec"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_sec").isNotNull() & F.col("_v").isNotNull())
    cells = base.select(
        F.explode(
            F.array(*[F.lit(w) for w in widths])
        ).alias("_w"),
        "_sec",
        "_v",
    ).select(
        "_w",
        F.floor(F.col("_sec") / F.col("_w")).cast("bigint").alias("_bkt"),
        "_v",
    )
    means = cells.groupBy("_w", "_bkt").agg(
        (
            F.sum(F.col("_v").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_m")
    )
    mq = means.select(
        "_w", F.round(F.col("_m") * 1e6).cast("bigint").alias("_mq")
    )
    per_w = mq.groupBy("_w").agg(
        F.count(F.lit(1)).cast("bigint").alias("_nb"),
        F.sum(F.col("_mq").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("_s1"),
        F.sum(
            F.col("_mq").cast("decimal(38,0)")
            * F.col("_mq").cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("_s2"),
    )
    nb = F.col("_nb").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    var = (s2 / nb - (s1 / nb) * (s1 / nb)) / 1e12
    pts = per_w.filter(F.col("_nb") >= 2).select(
        F.lit("all").alias("_g"),
        F.log(F.col("_w").cast("double")).alias("_x"),
        F.when(var > 0.0, F.log(var)).alias("_y"),
    ).filter(F.col("_y").isNotNull())
    fit = ols_xy(pts, "_g", "_x", "_y")
    spark = df.sparkSession
    # Single materialization: take(1) runs the corpus job ONCE and the
    # (≤1-row) output is rebuilt from literals — the limit(1).count()
    # probe re-executed the full scan a second time (r12 ADVICE).
    rows = fit.take(1)
    if not rows:
        return spark.range(1).select(
            F.lit(0).cast("bigint").alias("n_scales_used"),
            F.lit(None).cast("double").alias("hurst"),
            F.lit(None).cast("double").alias("slope"),
            F.lit(None).cast("double").alias("r2"),
        )
    r = rows[0]
    return spark.range(1).select(
        F.lit(int(r["n_points"])).cast("bigint").alias("n_scales_used"),
        (
            F.round(
                F.lit(1.0) + F.lit(r["slope"]).cast("double") / 2.0, 6
            )
            + 0.0
        ).alias("hurst"),
        F.lit(r["slope"]).cast("double").alias("slope"),
        F.lit(r["r2"]).cast("double").alias("r2"),
    )


#: Euler-Mascheroni constant — the Gumbel mean offset (mu = m - gamma*beta).
_EULER_GAMMA = 0.5772156649015329


def gumbel_block_maxima(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    block_seconds: int = 86400,
    return_periods: tuple[int, ...] = (30, 365),
) -> DataFrame:
    """Extreme-value tail fit via BLOCK MAXIMA + Gumbel method of
    moments (Gumbel 1958; the Fisher-Tippett type-I limit for
    light-tailed maxima): per time block take the max, fit
    ``β̂ = s·√6/π``, ``μ̂ = m − γ·β̂`` from the maxima's mean/std, and
    read RETURN LEVELS ``μ − β·ln(−ln(1 − 1/T))`` — "the daily-max
    value exceeded once per T days". THE capacity-planning readout a
    percentile can't give: p99.9 describes the past sample; the
    return level extrapolates the tail law (Var/load/latency ceilings
    sized to a 1-in-365-day event).

    Returns ONE row ``(n_blocks, mu, beta, rl_<T> ...)``; NULL fit
    when < 2 blocks or zero variance. Method of moments (not ML) keeps
    the fit closed-form and deterministic — the documented trade: MOM
    is consistent for Gumbel and needs no iteration; heavy-tailed data
    (Fréchet domain) biases it low, which the companion
    :func:`~.operators.kll` quantile sketches would flag.

    Determinism: block maxima are exact (max of doubles); each maximum
    micro-quantizes to integer units so the moment sums are exact
    DECIMAL integers (the welch_t recipe); μ/β/levels are one-shot
    mirrored doubles. Shape: one (block) max aggregate (map-side
    combinable) + one 1-row moment reduction — linear, no windows.
    """
    from ..functions.dates import epoch_seconds

    base = df.select(
        epoch_seconds(F.col(ts_col)).alias("_sec"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_sec").isNotNull() & F.col("_v").isNotNull())
    blocks = base.select(
        F.floor(F.col("_sec") / F.lit(int(block_seconds)))
        .cast("bigint")
        .alias("_b"),
        "_v",
    ).groupBy("_b").agg(F.max("_v").alias("_mx"))
    mq = blocks.select(
        F.round(F.col("_mx") * 1e6).cast("bigint").alias("_mq")
    )
    agg = mq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum(F.col("_mq").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("_s1"),
        F.sum(
            F.col("_mq").cast("decimal(38,0)")
            * F.col("_mq").cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("_s2"),
    )
    import math as _m

    nb = F.col("n_blocks").cast("double")
    mean = F.col("_s1").cast("double") / nb / 1e6
    var = (
        F.col("_s2").cast("double") / nb
        - (F.col("_s1").cast("double") / nb)
        * (F.col("_s1").cast("double") / nb)
    ) / 1e12
    beta = F.sqrt(var) * F.lit(_m.sqrt(6.0) / _m.pi)
    mu = mean - F.lit(_EULER_GAMMA) * beta
    ok = (F.col("n_blocks") >= 2) & (var > 0.0)
    cols = [
        "n_blocks",
        (F.round(F.when(ok, mu), 6) + 0.0).alias("mu"),
        (F.round(F.when(ok, beta), 6) + 0.0).alias("beta"),
    ]
    for t in return_periods:
        if t < 2:
            raise ValueError("gumbel_block_maxima: return periods >= 2")
        rl = mu - beta * F.lit(
            _m.log(-_m.log(1.0 - 1.0 / float(t)))
        )
        cols.append(
            (F.round(F.when(ok, rl), 6) + 0.0).alias(f"rl_{int(t)}")
        )
    return agg.select(*cols)
