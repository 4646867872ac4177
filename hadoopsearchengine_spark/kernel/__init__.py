"""Pure deterministic kernels shared between the Spark engine and the
single-node oracle (``oracle/``). No Spark imports allowed here — identity
between the distributed path and the oracle path is *by construction*."""
