"""TPU compute primitives: GRU scans, additive attention, conv/BN layers,
and the VQT audio frontend. Pure-functional JAX over parameter pytrees."""
