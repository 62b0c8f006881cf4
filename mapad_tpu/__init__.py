"""mapad_tpu: a TPU-native ancient-DNA-damage-aware short-read mapper.

A from-scratch re-design of the capabilities of mpieva/mapAD (BWA-backtrack-style
inexact search on a bidirectional FMD-index with an ANFO/r-candy probabilistic
damage model) for TPU hardware: JAX/XLA/Pallas for the batched search engine,
numpy/C++ for host-side index construction and HTS I/O.

Layer map (mirrors reference layer map, see SURVEY.md §1):
  cli          -- `mapad-tpu {index,map,worker}` command line
  index        -- index construction (SAIS, BWT, Occ, sampled SA) + runtime loaders
  models       -- sequence difference models (aDNA damage scoring) + mismatch bounds
  ops          -- device compute: FMD-index ops, batched k-mismatch search
  map          -- mapping pipeline: input chunking, postprocessing, BAM generation
  io           -- FASTA/FASTQ/BAM/BGZF readers and writers
  distributed  -- multi-host sharding and the dispatcher/worker cluster mode
"""

__version__ = "0.1.0"

CRATE_NAME = "mapAD"
PROG_NAME = "mapad_tpu"


def build_info_version() -> str:
    """Version string with git state, like the reference's `built` embed
    (src/lib.rs:9-27): "<semver> (<short-hash>[-dirty])" when the source
    tree is a git checkout, plain semver otherwise.  Cached per process."""
    global _BUILD_INFO
    if _BUILD_INFO is None:
        import os
        import subprocess

        ver = __version__
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        try:
            h = subprocess.run(
                ["git", "-C", root, "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, timeout=5,
            )
            if h.returncode == 0:
                dirty = subprocess.run(
                    ["git", "-C", root, "status", "--porcelain",
                     "--untracked-files=no"],
                    capture_output=True, text=True, timeout=5,
                )
                suffix = "-dirty" if dirty.stdout.strip() else ""
                ver = f"{ver} ({h.stdout.strip()}{suffix})"
        except Exception:
            pass
        _BUILD_INFO = ver
    return _BUILD_INFO


_BUILD_INFO = None
