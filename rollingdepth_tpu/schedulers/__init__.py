from .common import make_betas, make_alphas_cumprod  # noqa: F401
from .ddim import DDIMConfig, DDIMScheduler  # noqa: F401
from .euler_ancestral import EulerAncestralConfig, EulerAncestralScheduler  # noqa: F401
from .dpmsolver import DPMSolverConfig, DPMSolverMultistepScheduler  # noqa: F401
