import os
import sys

# repo root on sys.path so `datafusion_orc_spark` and `__spark_entry__` import
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
