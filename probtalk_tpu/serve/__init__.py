"""Production serving: session-based streaming audio->motion with
cross-session micro-batching (the deployment story the reference's
`scripts/demo.py` one-shot path stops short of)."""

from probtalk_tpu.serve.engine import EngineBusy, ServingEngine, SessionClosed

__all__ = ["EngineBusy", "ServingEngine", "SessionClosed"]
