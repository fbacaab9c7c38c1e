from . import metrics
from .render import render_mesh_dir, render_textured_views
from .run_evaluation import evaluate_geometry, evaluate_image_dirs
