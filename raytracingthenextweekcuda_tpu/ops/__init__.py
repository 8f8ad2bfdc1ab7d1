"""Batched compute ops: vector math, sampling, intersection, BSDFs, BVH."""
