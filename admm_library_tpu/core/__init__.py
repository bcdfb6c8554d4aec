from . import admm, scaling
