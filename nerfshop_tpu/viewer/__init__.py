from nerfshop_tpu.viewer.server import ViewerServer, serve  # noqa: F401
