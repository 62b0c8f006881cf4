"""Shared types for the persistent-pool batched search kernel.

The fixed-batch kernel (ops/search.py) runs every lane until the slowest
lane's search ends, so most lanes idle through the tail.  The pool variant
keeps all lanes busy: the moment a lane finishes a read it synthesizes a
fresh root frame for the next read from the pool (SURVEY.md hard part #3,
"frontier compaction/rebatching across lanes").

The production kernel lives in ops/search_pool2.py (the scatter-free
"gen-2" step).  The original gen-1 kernel that used to live here was
retired in round 3 once gen-2 superseded it on every measured workload
(652 -> 44.4 us/step across round 2, ROADMAP.md); see git history for the
implementation.  Its oracle-equivalence suite (tests/test_device_search.py,
tests/test_device_configs.py) now pins gen-2 directly.  This module keeps
the PoolConfig/PoolResult contract both generations shared.

Step semantics (pop order, bounds, early stops) are identical to the
fixed-batch kernel and the host oracle; equivalence is property-tested.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

OP_ABANDON_BIT = 1 << 22  # in-store marker: read hit the per-read step cap


class PoolConfig(NamedTuple):
    max_len: int = 128  # M
    lanes: int = 512  # L
    total_steps: int = 16384  # S: shared step budget == store rows / CANDS
    read_step_cap: int = 2048  # abandon a read after this many pops
    max_chains: int = 8192  # compacted hit-chain capacity
    compute_forward_part: bool = False
    # With backward-only models (find_alignment_start == len, the production
    # aDNA model) start+len == n is invariant, so the extension direction is
    # always Backward; setting this statically removes every direction
    # select from the step.
    backward_only: bool = True
    # Performance-ablation flags (tools/ablate_pool.py ONLY -- every flag
    # breaks search semantics; used to attribute per-step cost on real HW):
    #   "pop"    round-robin block selection instead of the two-level pop
    #   "extend" skip the occ-row gathers (synthesize child intervals)
    #   "lut"    skip the score/Bi-D row gather (constant scores)
    #   "frame"  skip the st_pack frame row gather
    #   "store"  skip the st_pack history column write
    #   "ring"   skip the st_mono/bm/sb pop-structure writes
    debug_ablate: tuple = ()
    # Per-read device step accounting for true per-read XD timing (gen-2
    # kernel): logs (read_id, steps consumed) at each lane refill; the
    # engine converts steps to seconds via the invocation's step time.
    track_read_steps: bool = False
    # In-kernel store generations: when > 1, a full frame store (step == S)
    # with live lanes is COMPACTED in place -- completed chains are
    # extracted into an accumulator, the store is shifted down by
    # delta = min(live lane_start) (live frames span at most the last
    # read_step_cap steps, so delta >= S - cap), parent pointers are
    # remapped by +9*delta and the pop rings rolled -- and the loop
    # continues with the freed budget.  Unfinished and undispatched reads
    # thus RESUME with their frontier intact instead of escalating and
    # re-running from scratch (the reference never restarts a read either:
    # it evicts worst frames in place, mapping.rs:1357-1380).  A boundary
    # costs ~2.5 full-store passes (~10 ms at the 2 GB production store)
    # vs ~600 ms device + host prep for a fresh retry invocation.
    # Requires read_step_cap + 4 <= total_steps so every boundary frees
    # at least one step.
    generations: int = 1
    # Early-stop for the spill generations (> first): at a store boundary
    # the loop only continues into another generation while at least this
    # many lanes are live; a thinner tail escalates as before (a step
    # costs the full L-wide work whatever the occupancy).
    min_live: int = 1
    # Per-generation step budget for the spill generations (0 = no cap:
    # run until the store refills or all lanes finish).  A small budget
    # clears the reads that merely needed a little more shared budget
    # while cap-bound "monster" reads -- which would abandon at
    # read_step_cap anyway -- stop burning whole-pool steps: the 4 Mbp
    # chip run with uncapped spill resolved ~1.1k cheap reads per pass
    # but spent full caps on 2.4k eventual abandons (ROADMAP round 5).
    spill_steps: int = 0
    # Fixed step count for ablation timing (0 = normal termination)
    debug_fixed_steps: int = 0


class PoolResult(NamedTuple):
    c_read: jax.Array  # (C,) i32 read id (-1 = unused entry)
    c_slot: jax.Array  # (C,) i32 store slot (descending == completion order)
    c_abandon: jax.Array  # (C,) bool: abandon marker, not a hit
    c_lower: jax.Array  # (C,) i32 (i64 in big-index mode)
    c_lrev: jax.Array  # (C,) i32 (i64 in big-index mode)
    c_size: jax.Array  # (C,) i32 (i64 in big-index mode)
    c_score: jax.Array  # (C,) f32
    c_ops: jax.Array  # (C, MW) i32 op words, 0-terminated
    n_chains: jax.Array  # () i32 (may exceed C -> escalate everything)
    lane_read: jax.Array  # (L,) i32 read id still held per lane (R = none)
    lane_unfinished: jax.Array  # (L,) bool lane held an unfinished read
    next_read: jax.Array  # () i32 pool watermark (reads >= this never ran)
    steps: jax.Array  # () i32
    # (R,) i32 per-read device step count (clipped at 4095), -1 for reads
    # that never finished on device or when track_read_steps is off; the
    # engine converts to seconds via the invocation's measured step time
    read_steps: jax.Array = None
