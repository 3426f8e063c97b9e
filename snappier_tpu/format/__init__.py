"""Format layer (L0): pure NumPy/Python implementation of the Snappy
wire formats — constants, varint, CRC32C, parse tables, and a scalar
oracle codec used as the test oracle for the TPU kernels."""
