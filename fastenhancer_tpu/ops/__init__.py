from .segmental_rms import segmental_rms, segmental_rms_pallas
from .gru_scan import gru_scan_pallas, gru_pallas

__all__ = ["segmental_rms", "segmental_rms_pallas", "gru_scan_pallas",
           "gru_pallas"]
