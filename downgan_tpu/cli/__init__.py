"""Command-line entry points.

Parity with the reference's entry layer (SURVEY §1 "Entry point / CLI"):
``train`` (``DoWnGAN/GAN/train.py``), ``prepare-data``
(``helpers/gen_train_test_netcdfs.py``), ``generate``
(``helpers/gen_fake_ds.py``), ``serve-tracking``
(``mlflow_tools/mlflow_server_cmd.py``) — unified under one click group:

    python -m downgan_tpu.cli COMMAND [OPTIONS]
"""
