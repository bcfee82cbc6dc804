"""Comparison-method zoo: JAX re-implementations of the baselines the
reference vendors under net/comparison_methods/ (SURVEY.md section 2.4).

Like the reference, these are standalone models that experimenters swap in
by hand — none are imported by the train/eval CLIs. All take (B, C, H, W)
cubes and return same-shape restorations unless noted.
"""

from mp_hsir_tpu.models.zoo.restormer import Restormer  # noqa: F401
from mp_hsir_tpu.models.zoo.nafnet import NAFNet  # noqa: F401
from mp_hsir_tpu.models.zoo.swinir import SwinIR  # noqa: F401
from mp_hsir_tpu.models.zoo.promptir import PromptIR  # noqa: F401
from mp_hsir_tpu.models.zoo.srformer import SRFormer  # noqa: F401
from mp_hsir_tpu.models.zoo.loformer import LoFormer  # noqa: F401
from mp_hsir_tpu.models.zoo.mlwnet import MLWNet  # noqa: F401
from mp_hsir_tpu.models.zoo.essa import ESSA  # noqa: F401
from mp_hsir_tpu.models.zoo.lkfn import LKFN  # noqa: F401
from mp_hsir_tpu.models.zoo.mbtaylorformer import MBTaylorFormer  # noqa: F401
from mp_hsir_tpu.models.zoo.sgnet import SGNet  # noqa: F401
from mp_hsir_tpu.models.zoo.diacmpn import DIACMPN  # noqa: F401
from mp_hsir_tpu.models.zoo.pipnet import PIPNet  # noqa: F401
