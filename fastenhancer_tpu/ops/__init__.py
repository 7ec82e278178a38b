from .segmental_rms import segmental_rms, segmental_rms_pallas

__all__ = ["segmental_rms", "segmental_rms_pallas"]
