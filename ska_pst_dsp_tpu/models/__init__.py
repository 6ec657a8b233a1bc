from .signals import (  # noqa: F401
    PureTone, Impulse, SquareWave, FrequencyComb, FrequencyWedge,
    GaussianNoise, DADAReadGenerator, Stream, make_generator,
)
from .streaming import (  # noqa: F401
    FilterBank, FilterBankState, InverseFilterBank, InverseFilterBankState,
    StatefulPipeline,
)
from .two_stage import TwoStageFilterBank, TwoStageInverseFilterBank  # noqa: F401
from .testers import (  # noqa: F401
    TestPureTone, TestImpulse, TestFrequencyComb, PhaseAverage,
)
