#!/usr/bin/env python
"""qasr experiment CLI — repo-root convenience wrapper.

Delegates to :mod:`qasr.cli` (installed as the ``qasr-train`` console
script); see that module for flags. Usage:

  python train.py --preset tiny_synthetic [--set train.num_steps=500]
  python train.py --preset timit_qcnn --set data.data_dir=/path/to/TIMIT
"""

from qasr.cli import main

if __name__ == "__main__":
    main()
