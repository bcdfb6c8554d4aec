from . import random_qp
