from . import icp, jacobians, residuals, trust_region  # noqa: F401
