from . import geometry, integrate, metrics
