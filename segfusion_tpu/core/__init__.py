"""Core runtime: scene volumes, database, per-frame pipeline."""

from .database import Database
from .pipeline import Pipeline
from .volume import SceneVolume, Voxelgrid, init_scene_volume
