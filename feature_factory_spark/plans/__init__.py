from .inspect import explain_str, plan_report
