from .klg import Frame, KlgLogReader, write_klg
from .ply import load_ply, save_ply
from .trajectory import ate_rmse, horn_align, read_freiburg, write_freiburg
from .tum import TumLogReader, associate, read_groundtruth

__all__ = [
    "Frame",
    "KlgLogReader",
    "write_klg",
    "TumLogReader",
    "associate",
    "read_groundtruth",
    "write_freiburg",
    "read_freiburg",
    "ate_rmse",
    "horn_align",
    "save_ply",
    "load_ply",
]
