from probtalk_tpu.viz.render import (  # noqa: F401
    render_skeleton_frames, save_gif, save_mjpeg_avi, RenderTool,
)
