"""CLI entry: ``python -m qrag_tpu.serving.app`` — the counterpart of
the reference's ``python app.py`` (``app.py:95-96``)."""

from qrag_tpu.serving.http_app import main

if __name__ == "__main__":
    main()
