from downgan_tpu.data.netcdf import NetCDFFile, read_variable, write_netcdf  # noqa: F401
from downgan_tpu.data.times import datetime_wrf_period, dt_index, wrf_to_dt, filter_times  # noqa: F401
from downgan_tpu.data.dataset import DeviceDataset, synthetic_dataset  # noqa: F401
from downgan_tpu.data.feed import HostDataset, prefetch_batches  # noqa: F401
from downgan_tpu.data.stream import LazyField, StreamDataset  # noqa: F401
from downgan_tpu.data.pipeline import (  # noqa: F401
    crop_array,
    standardize,
    standardize_all,
    train_test_split,
    concat_variables,
)
from downgan_tpu.data.eof import (  # noqa: F401
    EOFBasis,
    fit_eofs,
    fit_eofs_per_channel,
    low_pass_eof_batch,
    project,
    reconstruct,
)
from downgan_tpu.data.regrid import (  # noqa: F401
    TARGET_GRIDS,
    LonLatGrid,
    coarsen_block_mean,
    find_nearest_index,
    nearest_indices,
    remap_nearest,
)
from downgan_tpu.data.staging import (  # noqa: F401
    generate_train_test_coarse_fine,
    load_data,
    load_preprocessed,
    stage_datasets,
    write_preprocessed,
)
