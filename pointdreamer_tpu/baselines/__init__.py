from .spr import recon_one_shape_SPR
