from downgan_tpu.data.netcdf import NetCDFFile, read_variable, write_netcdf  # noqa: F401
from downgan_tpu.data.times import datetime_wrf_period, wrf_to_dt, filter_times  # noqa: F401
from downgan_tpu.data.dataset import DeviceDataset, synthetic_dataset  # noqa: F401
from downgan_tpu.data.pipeline import (  # noqa: F401
    crop_array,
    standardize,
    standardize_all,
    train_test_split,
    concat_variables,
)
