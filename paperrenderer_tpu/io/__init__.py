from .image import write_png
from .gltf import GltfScene, instantiate, load_gltf

__all__ = ["write_png", "GltfScene", "instantiate", "load_gltf"]
