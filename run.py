"""Launcher: `streamlit run run.py` (reference: run.py:1-21)."""

import sys
from pathlib import Path

root = Path(__file__).parent
if str(root) not in sys.path:
    sys.path.insert(0, str(root))

from deal_yolo_daya_tpu.app import main

if __name__ == "__main__":
    main()
