"""App shell: page config, style injection, session-state init, page router
(reference: src/deal_yolo_data/app.py:17-65 — same session keys and defaults).
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path


def init_session_state():
    import streamlit as st

    if "run_id" not in st.session_state:
        st.session_state.run_id = datetime.now().strftime("%Y%m%d_%H%M%S")
    st.session_state.setdefault("step_done", {})
    st.session_state.setdefault("logs", {})
    st.session_state.setdefault("outputs", {})
    if "config" not in st.session_state:
        st.session_state.config = {
            "use_reference": True,
            "update_reference": False,
            "backup_reference": True,
            "merge_chunk_size": 100000,
            "keep_outputs": True,
            "min_boxes": 2,
            "iou_threshold": 0.98,
            "run_download": False,
            "max_images": None,
            "ref_mode": "上传参考CSV",
            "rule_mode": "宽表(类别为列)",
            "train_ratio": 0.8,
            "val_ratio": 0.1,
            "test_ratio": 0.1,
            "random_seed": 42,
        }
    st.session_state.setdefault("input_ready", False)
    if "output_root" not in st.session_state:
        st.session_state.output_root = str(Path.cwd() / "runs" / st.session_state.run_id)


def main():
    import streamlit as st

    from .ui.pages.processing import render_processing_pipeline
    from .ui.pages.training import render_training_platform
    from .ui.styles import inject_style

    st.set_page_config(
        page_title="YOLO Data & Training Platform (TPU)",
        page_icon="🚀",
        layout="wide",
        initial_sidebar_state="expanded",
    )
    inject_style()
    init_session_state()

    st.sidebar.title("🚀 导航")
    page = st.sidebar.radio("选择功能模块", ["数据处理流水线", "YOLO 训练平台"])

    if page == "数据处理流水线":
        render_processing_pipeline()
    elif page == "YOLO 训练平台":
        render_training_platform()


if __name__ == "__main__":
    main()
