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
