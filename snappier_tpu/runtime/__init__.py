"""Runtime layer (L3/L4): batching, padding/bucketing policy, host
assembly, the public block API, and the framing stream API."""
