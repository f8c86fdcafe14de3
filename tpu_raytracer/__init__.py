"""tpu_raytracer — a TPU-native ray tracing framework (JAX/XLA/Pallas).

Built from scratch with the capabilities of the reference CUDA raytracer
(AFIDclan/cuda-raytracing): OBJ scenes, SAH BVH, instanced meshes,
fisheye pinhole camera, textured materials, directional lighting — but
redesigned for TPU: SoA scene arrays, packet (tile-coherent) BVH
traversal in Pallas, and multi-chip image tiling via shard_map.
"""

__version__ = "0.1.0"
