# Pallas kernels for the hot inner ops (populated as profiling justifies).
