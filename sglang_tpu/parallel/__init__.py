from sglang_tpu.parallel.mesh import MeshContext, ParallelConfig  # noqa: F401
