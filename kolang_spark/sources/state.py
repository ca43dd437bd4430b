"""Construction-parameter pinning for persisted operator state.

Several operators persist compact derived state between runs — MinHash
band keys (`kolang_spark.llm.dedup.incremental_minhash_dedup`),
sign-LSH band keys (`incremental_embedding_dedup`), kept-line hashes
(`incremental_line_dedup`), exact-dedup fingerprints
(`incremental_exact_dedup`), count-min sketch counters
(`kolang_spark.streaming.sinks.cms_sink`). Every one of these states
is only meaningful under the exact construction parameters that built
it: band keys from a different hash function, shingle width, or plane
count never collide with the state's keys, and CMS counters bucketed
with a different width/salt estimate garbage. Probing with mismatched
parameters does not error — it silently accepts every duplicate (or
returns silently-wrong counts), the worst possible failure mode for a
dedup operator.

The r11 guard pinned exactly one parameter (the minhash ``hash_fn``)
via a ``_ks_hashfn.json`` sidecar; the r11 verdict's #1 item is to
generalize that to EVERY construction parameter of EVERY persisted
state. This module is that generalization: one ``_ks_state.json``
sidecar per state directory, holding ``{"kind": ..., "params": {...}}``.

Contract (shared by all state families):

- **verify**: a probe against an existing state with a pinned sidecar
  must match the sidecar's ``kind`` and every probed parameter, or it
  raises ``ValueError`` naming the mismatched keys — before any join
  runs against never-colliding keys.
- **pin**: after the first state append, the writer pins its
  parameters. The write is ATOMIC (temp name + rename, advisor r11
  item 3): a crash mid-write leaves no half-written sidecar, so the
  probe path can never wedge on a truncated JSON file.
- **heal**: a missing or unparseable sidecar falls back to the state
  family's legacy resolution (column scan, twin-sidecar migration, or
  explicit caller assertion) and re-pins a fresh sidecar — corruption
  costs one legacy resolution, never a permanent failure.
- **legacy**: states written before their parameters were stamped
  carry no provenance for them; the caller's values are pinned as the
  assertion of record (exactly the hash_fn guard's documented escape —
  for parameters whose package default never changed, that assertion
  is the same trust the pre-guard code extended on every probe, and
  every FUTURE probe is verified against it).

The sidecar lives INSIDE the state directory under a ``_``-prefixed
name, which Spark's file listing skips, so the state parquet reads are
unaffected. All IO routes through the Hadoop ``FileSystem`` helpers in
:mod:`kolang_spark.sources.io`, so state paths may be object-store
URIs (``s3a://``/``hdfs://``/``abfs://``).

Reference: the reference engine persists no cross-run operator state
(its dedup is single-run), so this module has no reference
counterpart; the contract follows the bloom sidecar's param-meta
pattern (`kolang_spark/llm/dedup.py` ``_write_bloom_meta``).
"""

from __future__ import annotations

import json
from typing import Callable, Mapping, Optional

__all__ = [
    "state_meta_path",
    "read_state_meta",
    "pin_state_meta",
    "check_state_meta",
    "ensure_state_pinned",
]

STATE_META_NAME = "_ks_state.json"


def state_meta_path(state_path: str) -> str:
    """Path of a state dir's construction-params sidecar. Leading
    underscore: Spark's file listing skips ``_``-prefixed files, so
    the sidecar can live inside the parquet dir without breaking
    reads. Plain ``/`` join, never ``os.path`` — the path may be a
    fully-qualified object-store URI."""
    return state_path.rstrip("/") + "/" + STATE_META_NAME


def read_state_meta(spark, state_path: str) -> Optional[dict]:
    """The pinned ``{"kind": ..., "params": {...}}`` dict, or ``None``
    when the sidecar is missing OR unreadable/corrupt (truncated by a
    crash predating atomic writes, foreign content) — corrupt heals
    exactly like missing: the caller re-resolves via its legacy branch
    and re-pins a fresh sidecar (advisor r11 item 3: a permanent
    ``JSONDecodeError`` on every probe must never wedge the state)."""
    from kolang_spark.sources.io import fs_read_text

    raw = fs_read_text(spark, state_meta_path(state_path))
    if raw is None:
        return None
    try:
        meta = json.loads(raw)
        if not isinstance(meta, dict) or not isinstance(meta.get("kind"), str):
            return None
        params = meta.get("params")
        if not isinstance(params, dict):
            return None
        return meta
    except (ValueError, TypeError):
        return None


def pin_state_meta(spark, state_path: str, kind: str, params: Mapping) -> None:
    """Atomically write the sidecar: temp name (also ``_``-prefixed,
    so Spark never lists a half-written file) then rename-with-
    OVERWRITE in one metadata op (``fs_rename_overwrite``), so a
    concurrent prober sees either the previous sidecar or the new one
    — never 'no sidecar' (a no-sidecar read would fall into legacy
    resolution and could re-pin unverified params; advisor r12).
    Only where overwrite-rename is unsupported (object stores with no
    AbstractFileSystem binding) does this degrade to delete-then-
    rename, whose brief missing-sidecar window can at worst trigger
    one spurious legacy resolution — which re-pins from the state
    itself, so the healed sidecar still reflects construction truth.
    Every path renames a COMPLETE temp file, so no reader ever sees
    truncated JSON."""
    from kolang_spark.sources.io import (
        fs_delete,
        fs_rename,
        fs_rename_overwrite,
        fs_write_text,
    )

    dst = state_meta_path(state_path)
    tmp = dst + ".tmp"
    content = json.dumps({"kind": kind, "params": dict(params)}, sort_keys=True)
    fs_write_text(spark, tmp, content)
    if fs_rename_overwrite(spark, tmp, dst):
        return
    fs_delete(spark, dst, recursive=False)
    if not fs_rename(spark, tmp, dst):
        # rename unsupported or raced (two concurrent pinners of the
        # SAME params — both wrote identical temp content, one rename
        # wins): fall back to an in-place write so the pin lands
        fs_write_text(spark, dst, content)
        fs_delete(spark, tmp, recursive=False)


def check_state_meta(
    spark,
    state_path: str,
    kind: str,
    params: Mapping,
    legacy_resolve: Optional[Callable[[], Mapping]] = None,
    consequence: str = (
        "keys built under different parameters never collide, so every "
        "duplicate would be silently accepted"
    ),
) -> dict:
    """Verify a probe's construction params against the state's pinned
    sidecar; pin them when no (valid) sidecar exists yet.

    - State path missing → nothing persisted, nothing to verify:
      returns ``params`` (the writer pins after its first append).
    - Valid sidecar → ``kind`` and every key of ``params`` must match
      the pinned values, else ``ValueError`` naming the mismatches.
    - Missing/corrupt sidecar → ``legacy_resolve()`` (state-family
      hook: column scan, twin-sidecar migration, explicit-assertion
      requirement; may itself raise) resolves the params to pin;
      without a hook the caller's params are the assertion of record.
      A fresh sidecar is pinned either way (self-healing).

    Returns the resolved params dict (== ``params`` unless the legacy
    hook refined them).
    """
    from kolang_spark.sources.io import path_exists

    if not path_exists(spark, state_path):
        return dict(params)
    meta = read_state_meta(spark, state_path)
    if meta is not None:
        if meta["kind"] != kind:
            raise ValueError(
                f"state at {state_path} is pinned as kind="
                f"'{meta['kind']}', probed as kind='{kind}' — this is a "
                "different operator family's state; probing it would "
                f"produce silently wrong results ({consequence}). Use "
                "the state's own operator, or start a fresh state_path."
            )
        pinned = meta["params"]
        bad = {
            k: (pinned.get(k), v)
            for k, v in params.items()
            if pinned.get(k) != v
        }
        if bad:
            detail = ", ".join(
                f"{k}: pinned={p!r} probed={v!r}" for k, (p, v) in sorted(bad.items())
            )
            raise ValueError(
                f"state at {state_path} was built with different "
                f"construction parameters ({detail}) — {consequence}. "
                "Pass the pinned values, or start a fresh state_path."
            )
        return dict(params)
    resolved = dict(legacy_resolve()) if legacy_resolve is not None else dict(params)
    pin_state_meta(spark, state_path, kind, resolved)
    return resolved


def ensure_state_pinned(spark, state_path: str, kind: str, params: Mapping) -> None:
    """Post-append fast pin: write the sidecar iff none exists — NO
    legacy resolution, no Spark jobs. ONLY valid when the caller ran
    :func:`check_state_meta` against the same path earlier in the same
    call (every incremental operator does, at probe time): if the
    state pre-existed, that check already verified-or-pinned, so the
    sidecar is present and this is one O(1) metadata read; if the
    state was created by this very call's append, the caller's params
    ARE the construction truth and are pinned directly. Exists because
    the r12 A/B measured the naive alternative — re-running the full
    check (with its legacy column-scan Spark jobs) after every first
    append — at ~0.5-0.8 s per streaming-sink run (BASELINE.md r12).

    An EXISTING sidecar is still compared (O(1), review r12): two
    concurrent first-writers racing on a fresh state_path both pass
    the probe-time check (nothing existed to verify), both append,
    and one pins — without this compare the loser would no-op
    silently and the mixed-key state would accept every duplicate
    forever; instead the loser raises, naming both param sets. The
    state is still mixed (plain parquet has no transactional append —
    start a fresh state_path), but loudly."""
    meta = read_state_meta(spark, state_path)
    if meta is None:
        pin_state_meta(spark, state_path, kind, params)
        return
    bad = {
        k: (meta["params"].get(k), v)
        for k, v in params.items()
        if meta["params"].get(k) != v
    }
    if meta["kind"] != kind or bad:
        detail = ", ".join(
            f"{k}: pinned={p!r} ours={v!r}" for k, (p, v) in sorted(bad.items())
        ) or f"kind: pinned={meta['kind']!r} ours={kind!r}"
        raise ValueError(
            f"state at {state_path} was pinned by a concurrent writer "
            f"with different construction parameters ({detail}) — the "
            "state now holds keys from both and cannot be trusted; "
            "start a fresh state_path."
        )
