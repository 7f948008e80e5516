"""Config tree: defaults, dict merge, env overrides (SURVEY.md §5
config/flag system)."""

from qrag_tpu.config import DEFAULT_QUANTUM_KEYWORDS, QragConfig


def test_defaults_match_reference():
    cfg = QragConfig()
    assert cfg.controller.complexity_threshold == 8  # controller.py:40
    assert len(cfg.controller.quantum_keywords) == 10  # controller.py:25-36
    assert "sponsor" in DEFAULT_QUANTUM_KEYWORDS
    assert cfg.classical.batch_size == 32  # classical.py:60
    assert cfg.classical.max_sequence_length == 512
    assert cfg.classical.max_retries == 3
    assert cfg.quantum.method == "state_fidelity"  # quantum.py:33
    assert cfg.quantum.n_qubits == 4  # quantum.py:34
    assert cfg.serving.mcp_port == 6969  # server.py default


def test_from_dict_partial_merge():
    cfg = QragConfig.from_dict(
        {"quantum": {"n_qubits": 10}, "serving": {"port": 9999}}
    )
    assert cfg.quantum.n_qubits == 10
    assert cfg.quantum.method == "state_fidelity"  # untouched default
    assert cfg.serving.port == 9999
    assert cfg.controller.complexity_threshold == 8


def test_env_overrides():
    env = {
        "QRAG_QUANTUM_N_QUBITS": "6",
        "QRAG_INDEX_USE_PALLAS": "false",
        "QRAG_SERVING_DOC_BUCKETS": "16,64",
        "QRAG_CLASSICAL_METHOD": "cross-encoder",
    }
    cfg = QragConfig().with_env_overrides(env)
    assert cfg.quantum.n_qubits == 6
    assert cfg.index.use_pallas is False
    assert cfg.serving.doc_buckets == (16, 64)
    assert cfg.classical.method == "cross-encoder"


def test_to_dict_roundtrip():
    cfg = QragConfig.from_dict({"quantum": {"n_qubits": 7}})
    d = cfg.to_dict()
    cfg2 = QragConfig.from_dict(d)
    assert cfg2.quantum.n_qubits == 7
    assert cfg2 == cfg
