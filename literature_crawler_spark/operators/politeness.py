"""Politeness + priority scheduling: per-host quotas as window ranking.

The reference paces fetches with fixed sleeps inside a serial loop
(``protocol_io_crawl.py:80`` sleep(3); ``nature_protocol_crawl.py:269``
sleep(1); ``current_protocol_crawl_util.py:131`` sleep(15)) — serial
execution *is* its politeness mechanism. At cluster scale politeness becomes
a per-wave, per-host admission quota: each wave schedules at most
``budget_per_wave`` URLs per host, and the wave cadence supplies the
inter-request delay (wave_period / budget >= min_interval).

Correctness requirement (SURVEY.md §7.3 hard part 2): the per-host
row_number() ranking is only exact if a host never spans partitions, so the
quota window partitions by host BEFORE any skew salting; the salt is applied
AFTER the cutoff, purely to spread the scheduled rows of a supernode host
across fetch partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUDGET = 10
N_SALT = 16


def schedule_wave(
    pending: DataFrame,
    politeness: DataFrame | None,
    default_budget: int = DEFAULT_BUDGET,
    order_cols: tuple[str, ...] = ("priority", "seq"),
    two_phase: bool = False,
) -> DataFrame:
    """Rank pending URLs within each host by (priority, seq) and keep the
    per-host budget; adds ``salt`` for downstream fetch distribution.

    Returns the scheduled subset with a ``host_rank`` column; the
    politeness table is broadcast (small dim).

    ``two_phase``: the quota rank runs in two window passes — (1) per
    (host, presalt-shard) local top-budget, (2) exact per-host rank over
    the <= N_SALT x budget survivors. The global per-host top-B is always
    contained in the union of per-shard top-Bs, so the result is
    IDENTICAL to the single window (property-tested). Turn it ON when a
    supernode host's pending backlog is orders of magnitude above its
    budget (at 10^10-frontier scale a hot host can hold 10^8 pending rows
    — a single window task sorting that is the Amdahl cap; phase 1 splits
    it across N_SALT tasks and prunes the phase-2 input to
    N_SALT x budget). Left OFF by default because phase 1 adds a second
    full shuffle of the pending set — measured 15-25% slower end-to-end
    when per-(host, shard) groups are already near the budget (the
    moderate-skew regime of the local bench).
    """
    if politeness is not None:
        pending = pending.join(
            F.broadcast(politeness.select("host", "budget_per_wave")), "host", "left"
        )
    else:
        pending = pending.withColumn("budget_per_wave", F.lit(None).cast("int"))
    budget = F.coalesce(F.col("budget_per_wave"), F.lit(default_budget))
    order = [F.col(c).asc() for c in order_cols]
    if two_phase:
        shard = F.pmod(F.xxhash64(F.col("canon_url"), F.lit(2)), F.lit(N_SALT)).cast("int")
        w1 = Window.partitionBy("host", "_ps").orderBy(*order)
        pending = (
            pending.withColumn("_ps", shard)
            .withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= budget)
            .drop("_ps", "_r1")
        )
    w = Window.partitionBy("host").orderBy(*order)
    scheduled = (
        pending.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= budget)
        .drop("budget_per_wave")
    )
    # salt AFTER the quota cutoff: spreads a supernode host's scheduled rows
    # over N_SALT fetch partitions without breaking per-host quota math
    return scheduled.withColumn(
        "salt", F.pmod(F.xxhash64(F.col("canon_url"), F.lit(1)), F.lit(N_SALT)).cast("int")
    )


def wave_cadence_ok(politeness: DataFrame, wave_period_ms: int) -> DataFrame:
    """Hosts whose (budget, min_interval) fit the wave period — i.e.
    budget_per_wave * min_interval_ms <= wave_period_ms. Used to derive a
    compliant per-wave budget when the configured one is too aggressive."""
    # try_divide/try_cast: 'Crawl-delay: 0' produces min_interval_ms = 0,
    # which must mean "no per-request spacing" (budget_per_wave wins),
    # not an ANSI DIVIDE_BY_ZERO abort of the wave-budget derivation
    return politeness.withColumn(
        "effective_budget",
        F.least(
            F.col("budget_per_wave"),
            F.greatest(
                F.coalesce(
                    F.try_divide(F.lit(wave_period_ms), F.col("min_interval_ms"))
                    .try_cast("int"),
                    F.col("budget_per_wave"),
                ),
                F.lit(1),
            ),
        ),
    )
