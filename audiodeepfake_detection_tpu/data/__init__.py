"""Host-side data layer: native WAV IO, dataset index, batch loaders."""

from .wavio import wav_info, wav_read, wav_read_batch  # noqa: F401
from .dataset import CustomDataset, get_custom_dataset  # noqa: F401
from .loader import FrameLoader  # noqa: F401
