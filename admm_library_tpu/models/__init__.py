from . import (                                               # noqa: F401
    clohessy_wiltshire, double_integrator, low_thrust, monte_carlo,
    partitioned, random_qp)
