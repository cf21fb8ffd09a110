"""Legacy / baseline model families carried for capability parity
(SURVEY.md §2.2): the TalkSHOW ancestor system and older baselines."""

from probtalk_tpu.models.legacy.vqvae_1d import LegacyVQVAE, LegacyAE  # noqa: F401
from probtalk_tpu.models.legacy.pixelcnn import GatedPixelCNN2D  # noqa: F401
from probtalk_tpu.models.legacy.baselines import (  # noqa: F401
    LS3DCG, Speech2GestureG, Speech2GestureD, Audio2Gestures, BodyAE,
)
from probtalk_tpu.models.legacy.s2g_exact import (  # noqa: F401
    LS3DCGDiscriminator, LS3DCGGenerator, S2GDiscriminator, S2GGenerator,
    ls3dcg_losses, s2g_gan_losses,
)
from probtalk_tpu.models.legacy.a2g_exact import (  # noqa: F401
    A2GGenerator, a2g_losses,
)
from probtalk_tpu.models.legacy.s2glayers_exact import (  # noqa: F401
    DiscriminatorS2GL, GeneratorS2GL, UNetS2G,
)
