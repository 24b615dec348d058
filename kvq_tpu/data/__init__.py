from .samplers import UnifiedFrameSampler  # noqa: F401
from .fragments import get_spatial_fragments, fragment_index_maps  # noqa: F401
from . import views, decode  # noqa: F401
from .datasets import (  # noqa: F401
    KVQDataset,
    SimpleVQADataset,
    GenericViewDataset,
    ViewDecompositionDataset,
    ViewDecompositionDataset_KVQ,
    ViewDecompositionDataset_add_forSimpleVQA,
)
from .legacy_datasets import (  # noqa: F401
    CroppedImageDataset,
    CroppedVideoDataset,
    FastVQAPlusPlusDataset,
    FragmentImageDataset,
    FragmentVideoDataset,
    ResizedImageDataset,
    ResizedVideoDataset,
)
from .tokenizer import SimpleTokenizer, tokenize  # noqa: F401
