"""Reference-parity pipeline plans (L0 -> L1 -> L2) composed from operators."""
