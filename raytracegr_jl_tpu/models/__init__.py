from . import camera, objects, scenes
