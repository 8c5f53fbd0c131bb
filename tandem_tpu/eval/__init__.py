from .ate import (align_horn, align_sim3, associate, evaluate_ate,
                  evaluate_rpe, evaluate_rpe_stamped, rpe_stats)
