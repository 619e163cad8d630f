from cl4wsis_tpu.wss.losses import (balanced_mask_loss_ce, balanced_mask_loss_unce,
                                    bce_loss, binarize, ngwp_focal, pseudo_gtmask,
                                    randrop_loss)
from cl4wsis_tpu.wss.modules import PeakGenerator, PseudoLabeler, ngwp, pam

__all__ = ["balanced_mask_loss_ce", "balanced_mask_loss_unce", "bce_loss",
           "binarize", "ngwp_focal", "pseudo_gtmask", "randrop_loss",
           "PeakGenerator", "PseudoLabeler", "ngwp", "pam"]
