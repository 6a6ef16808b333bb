"""nn_bvh_tpu — a TPU-native differentiable spectral path tracer + neural-BVH trainer.

Built from scratch in JAX/XLA/Pallas with the capabilities of Wil-Lee/NN_BVH
(pbrt-v4 wavefront spectral path tracing + the fork's neural-spatial-split treeNet
acceleration-structure learner), re-designed TPU-first:

- SoA everywhere: rays, hits, BVH nodes, and path state are flat jnp arrays
  (the reference generates SoA layouts with a codegen tool, `cmd/soac.cpp`;
  pytrees of flat arrays give us the same layout for free).
- Polymorphism by integer tag + `lax.switch` / masked lane select (the reference
  uses a 57-bit tagged pointer, `util/taggedptr.h:23`).
- Parallelism by `shard_map` over a `jax.sharding.Mesh` (the reference's whole
  "distributed backend" is a single-node thread pool, `util/parallel.h:313`).
- The hot BVH traversal runs as a Pallas packet-traversal kernel with the node
  stack in SMEM and vectorized AABB/triangle tests on the VPU.
"""

__version__ = "0.1.0"
