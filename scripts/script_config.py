"""Shared tool paths for the batch scripts (reference:
scripts/script_config.py:1-11). Every binary is optional: runners skip work
with a clear message when a tool is absent (none are shipped here)."""
import os

pc_error_path = os.environ.get('PC_ERROR_BIN', 'bin/pc_error')
tmc3_path = os.environ.get('TMC3_BIN', 'bin/tmc3')
tmc2_dir = os.environ.get('TMC2_DIR', '../mpeg-pcc-tmc2')
adlpcc_path = os.environ.get('ADLPCC_DIR', '../ADLPCC')
octattention_dir = os.environ.get('OCTATTENTION_DIR', '../OctAttention')
pcc_geo_color_dir = os.environ.get('PCC_GEO_COLOR_DIR', '../pcc-geo-color')
pc_evalue_path = os.environ.get('PC_EVALUE_BIN', 'bin/pc_evalue')
metric_dict_filename = 'metric_dict.json'
test_dir = os.environ.get('FPC_TEST_DIR', 'runs')
