"""PointDreamer-TPU: a TPU-native (JAX/XLA/Pallas) framework for zero-shot
textured-mesh reconstruction from colored point clouds.

Re-designed from scratch for TPU hardware with the capabilities of the
reference PointDreamer pipeline (colored point cloud -> textured mesh):

  geometry (implicit occupancy / Poisson-FFT / Hoppe SDF -> marching cubes)
  -> UV unwrap (chart growing + shelf packing, host) + atlas bake (device)
  -> multi-view z-buffer point splat -> 2D inpainting (DDNM diffusion /
     nearest / pull-push linear) -> Non-Border-First unprojection
  -> unseen-area completion -> optional atlas optimization -> OBJ/MTL/PNG.

Everything on the compute path is functional JAX (jit/vmap/scan/pjit);
sequential mesh-topology algorithms (welding, chart packing, decimation)
run on host, with a C++ quadric-decimation library under native/.
"""

__version__ = "0.1.0"
