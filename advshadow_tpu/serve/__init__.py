from advshadow_tpu.serve.deploy import DeployServer, default_generate_fn, send_request

__all__ = ["DeployServer", "default_generate_fn", "send_request"]
