from .ate import (align_horn, align_sim3, evaluate_ate, evaluate_rpe,
                  associate)
