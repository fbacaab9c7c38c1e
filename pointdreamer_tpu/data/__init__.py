from .sample import sample_colored_pc_from_mesh
