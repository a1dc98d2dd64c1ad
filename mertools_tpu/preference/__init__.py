from .judge import (PreferenceJudge, postprocess_preference,  # noqa: F401
                    preference_metric)
