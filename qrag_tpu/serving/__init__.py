from qrag_tpu.serving.http_app import (
    create_server,
    serve_in_thread,
    main as serve_main,
)

__all__ = ["create_server", "serve_in_thread", "serve_main"]
