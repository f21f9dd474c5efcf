"""Field arithmetic and compute primitives (TPU-first, uint32 limb form)."""
