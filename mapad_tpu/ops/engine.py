"""Device search engine: batches reads onto the TPU and reconstructs hits.

Drop-in replacement for map.pipeline.OracleSearchEngine.  Per chunk:
1. host: pad reads to the lane grid, build f32-exact score LUTs / Bi-D
   penalty elements / bound thresholds (numpy, same op order as reference)
2. device: one jitted `k_mismatch_search_batch` call over all lanes
3. host: walk the returned edit arenas to rebuild per-hit edit operation
   tracks; lanes flagged `escalate` (stack eviction, arena overflow, step
   budget) are re-run on the exact host oracle.
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..map import EditOperation, HitInterval
from ..map.oracle import k_mismatch_search as oracle_search
from ..index.fmd import BiInterval
from ..models.bounds import Continuous, Discrete, TestBound
from ..utils.seq import BASE_TO_CODE, CODE_TO_BASE
from .fm import DeviceFmIndex
from .search import SearchConfig, SearchParams, SearchResult, k_mismatch_search_batch

logger = logging.getLogger(__name__)

_RANK_TABLE = np.zeros(256, dtype=np.int32)
for _i, _c in enumerate(b"ACGT"):
    _RANK_TABLE[_c] = _i + 1


class DeviceSearchEngine:
    def __init__(self, fmd_index, parameters, lanes: int = 512,
                 config: SearchConfig | None = None):
        self.fmd = fmd_index
        self.parameters = parameters
        self.lanes = lanes
        self.device_index = DeviceFmIndex.from_host(fmd_index)
        sdm = parameters.difference_model
        self._is_backward_only = sdm.find_alignment_start(100) == 100
        if config is None:
            config = SearchConfig(compute_forward_part=not self._is_backward_only)
        self.config = config
        self._stats = {"device_lanes": 0, "escalated": 0, "batches": 0}

    # --- host-side per-read preparation (exact f32 paths) ---

    def _prepare(self, records, max_len: int):
        L = self.lanes
        sdm = self.parameters.difference_model
        mb = self.parameters.mismatch_bound

        pattern_rank = np.zeros((L, max_len), dtype=np.int32)
        pattern_code = np.full((L, max_len), 4, dtype=np.int32)
        n = np.zeros(L, dtype=np.int32)
        score_lut = np.zeros((L, max_len, 4), dtype=np.float32)
        pen = np.zeros((L, max_len), dtype=np.float32)
        split = np.zeros(L, dtype=np.int32)
        cutoff_scale = np.ones(L, dtype=np.float32)
        cutoff_thresh = np.full(L, np.float32(-np.inf), dtype=np.float32)
        repr_mm = np.full(L, np.float32(-np.inf), dtype=np.float32)

        for i, record in enumerate(records):
            seq = np.frombuffer(bytes(record.sequence), dtype=np.uint8)
            quals = np.frombuffer(bytes(record.base_qualities), dtype=np.uint8)
            ln = len(seq)
            n[i] = ln
            if ln == 0:
                continue
            pattern_rank[i, :ln] = _RANK_TABLE[seq]
            pattern_code[i, :ln] = BASE_TO_CODE[seq]
            split[i] = sdm.find_alignment_start(ln)
            score_lut[i, :ln] = sdm.score_lut(seq, quals)
            # Bi-D penalty elements (bi_d_array.rs:152-189)
            best_mm = sdm.min_penalties_mm_only(seq, quals)
            opt = sdm.optimal_penalties(seq, quals)
            mm_retval = np.float32(best_mm - opt)
            idx = np.arange(ln)
            gaps_allowed = (
                np.minimum(idx, ln - idx - 1) >= self.parameters.gap_dist_ends
            )
            pen[i, :ln] = np.where(
                gaps_allowed,
                np.maximum(mm_retval, self.parameters.penalty_gap_extend),
                mm_retval,
            )
            # bound encoding: reject(v) == (v / scale) < thresh
            if isinstance(mb, Continuous):
                cutoff_scale[i] = mb._scale_read_length(ln)
                cutoff_thresh[i] = mb.cutoff
            else:  # Discrete / TestBound expose an absolute threshold
                cutoff_scale[i] = np.float32(1.0)
                cutoff_thresh[i] = mb.threshold_for_length(ln)
            if not isinstance(mb, TestBound):
                repr_mm[i] = mb.representative_mismatch_penalty

        return dict(
            pattern_rank=jnp.asarray(pattern_rank),
            pattern_code=jnp.asarray(pattern_code),
            n=jnp.asarray(n),
            score_lut=jnp.asarray(score_lut),
            pen=jnp.asarray(pen),
            split=jnp.asarray(split),
            cutoff_scale=jnp.asarray(cutoff_scale),
            cutoff_thresh=jnp.asarray(cutoff_thresh),
            repr_mm=jnp.asarray(repr_mm),
        )

    def _params(self) -> SearchParams:
        p = self.parameters
        return SearchParams(
            pgo_pge=jnp.float32(
                np.float32(p.penalty_gap_open + p.penalty_gap_extend)
            ),
            pge=jnp.float32(p.penalty_gap_extend),
            gap_dist_ends=jnp.int32(p.gap_dist_ends),
            max_gaps=jnp.int32(p.max_num_gaps_open),
            stack_limit_abort=jnp.bool_(p.stack_limit_abort),
        )

    # --- hit reconstruction ---

    def _extract_hits(self, result: SearchResult, lane: int, split: int):
        """Rebuild ordered edit tracks from the device arena (host, numpy)."""
        hcount = int(result.hcount[lane])
        parents = result.a_parent[lane]
        kinds = result.a_kind[lane]
        poss = result.a_pos[lane]
        bases = result.a_base[lane]
        hits = []
        for h in range(hcount):
            node = int(result.h_node[lane, h])
            # ancestors (inclusive, root exclusive), then bucket by position
            buckets: dict[int, list] = {}
            while node != 0:
                kind = int(kinds[node])
                pos = int(poss[node])
                base = int(CODE_TO_BASE[int(bases[node])]) if kind in (1, 3) else 0
                buckets.setdefault(pos, []).append(EditOperation(kind, pos, base))
                node = int(parents[node])
            track = []
            for pos in sorted(buckets):
                ops = buckets[pos]
                if pos < split:
                    track.extend(ops)
                else:
                    track.extend(reversed(ops))
            hits.append(
                HitInterval(
                    BiInterval(
                        int(result.h_lower[lane, h]),
                        int(result.h_lrev[lane, h]),
                        int(result.h_size[lane, h]),
                    ),
                    np.float32(result.h_score[lane, h]),
                    track,
                )
            )
        return hits

    # --- public API ---

    def search_chunk(self, records):
        out = []
        params = self._params()
        for base in range(0, len(records), self.lanes):
            batch = records[base : base + self.lanes]
            out.extend(self._search_batch(batch, params))
        return out

    def _search_batch(self, batch, params):
        t0 = time.perf_counter()
        max_len = self.config.max_len
        overlong = [i for i, r in enumerate(batch) if len(r.sequence) > max_len]
        prep = self._prepare(
            [r if len(r.sequence) <= max_len else _EMPTY for r in batch], max_len
        )
        result = jax.block_until_ready(
            k_mismatch_search_batch(
                self.device_index, prep["pattern_rank"], prep["pattern_code"],
                prep["n"], prep["score_lut"], prep["pen"], prep["split"],
                prep["cutoff_scale"], prep["cutoff_thresh"], prep["repr_mm"],
                params, self.config,
            )
        )
        result = jax.tree.map(np.asarray, result)
        elapsed = time.perf_counter() - t0
        per_read = elapsed / max(len(batch), 1)

        escalate = result.escalate
        split_arr = np.asarray(prep["split"])
        out = []
        n_escalated = 0
        for i, record in enumerate(batch):
            if i in overlong or (len(record.sequence) > 0 and escalate[i]):
                t1 = time.perf_counter()
                hits = oracle_search(
                    record.sequence, record.base_qualities, self.parameters,
                    self.fmd,
                )
                out.append((hits, time.perf_counter() - t1))
                n_escalated += 1
            else:
                hits = self._extract_hits(result, i, int(split_arr[i]))
                out.append((hits, per_read))
        self._stats["device_lanes"] += len(batch)
        self._stats["escalated"] += n_escalated
        self._stats["batches"] += 1
        if n_escalated:
            logger.debug("escalated %d/%d reads to host oracle", n_escalated, len(batch))
        return out


class _Empty:
    sequence = b""
    base_qualities = b""


_EMPTY = _Empty()
