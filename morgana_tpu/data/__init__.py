"""Data pipeline: sources, normalisers, datasets, loaders, file I/O.

Reference-parity surface of ``morgana/data.py`` plus the external
``tts_data_tools`` pieces the reference depended on (data sources, file I/O).
"""
from morgana_tpu.data import file_io
from morgana_tpu.data import sources as data_sources

from morgana_tpu.data.dataset import FilesDataset, assemble_item, bucket_size, collate
from morgana_tpu.data.loader import DataLoader, ToDeviceWrapper, batch
from morgana_tpu.data.normalisers import (
    Normalisers, _FeatureNormaliser, _SpeakerDependentNormaliser,
    MeanVarianceNormaliser, MinMaxNormaliser,
    SpeakerDependentMeanVarianceNormaliser, SpeakerDependentMinMaxNormaliser,
    normalise_mvn, denormalise_mvn, normalise_minmax, denormalise_minmax,
    fit_mvn_params, fit_minmax_params,
)
from morgana_tpu.data.sources import (
    _DataSource, NumpyBinarySource, TextSource, StringSource, ASCIISource,
    WavSource, SyntheticSource,
)
