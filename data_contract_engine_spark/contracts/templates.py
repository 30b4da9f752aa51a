"""Built-in contract templates.

Same three template capabilities as the reference
(`app/utils/contract_templates.py:5-140`): a flat user-events contract,
a nested array-of-object e-commerce contract, and an enum + statistics
IoT contract — plus the flagship transcripts contract (our primary
workload). YAML is authored for this engine; the field specs match the
reference templates' semantics so the ported unit/e2e tests apply.
"""

from __future__ import annotations

from typing import Dict, List, Optional

USER_EVENTS = """contract_version: "1.0"
domain: user-analytics
description: User analytics events
schema:
  user_id:
    type: string
    required: true
    pattern: "^usr_\\\\d+$"
  email:
    type: string
    required: true
    format: email
  age:
    type: integer
    required: false
    min: 13
    max: 120
  timestamp:
    type: timestamp
    required: true
quality_rules:
  freshness:
    max_latency_hours: 1
  completeness:
    min_row_count: 100
    max_null_percentage: 5
"""

ECOMMERCE_ORDERS = """contract_version: "1.0"
domain: e-commerce
description: E-commerce orders with nested line items
schema:
  order_id:
    type: string
    required: true
    pattern: "^ord_[a-zA-Z0-9]+$"
  customer_id:
    type: string
    required: true
  total_amount:
    type: float
    required: true
    min: 0
  items:
    type: array
    required: true
    items:
      type: object
      properties:
        product_id:
          type: string
          required: true
        quantity:
          type: integer
          required: true
          min: 1
        price:
          type: float
          required: true
          min: 0
  order_date:
    type: timestamp
    required: true
quality_rules:
  freshness:
    max_latency_hours: 24
  completeness:
    min_row_count: 1
"""

IOT_SENSOR = """contract_version: "1.0"
domain: iot
description: IoT sensor readings
schema:
  device_id:
    type: string
    required: true
  sensor_type:
    type: string
    required: true
    enum: [temperature, humidity, pressure]
  value:
    type: float
    required: true
  unit:
    type: string
    required: true
  timestamp:
    type: timestamp
    required: true
quality_rules:
  freshness:
    max_latency_hours: 1
  completeness:
    min_row_count: 10
  statistics:
    value:
      mean: {min: -100, max: 1000}
      std_dev: {max: 500}
"""

_TEMPLATES: Dict[str, Dict[str, str]] = {
    "user-events": {
        "description": "User analytics events with id/email/age checks",
        "domain": "user-analytics",
        "yaml": USER_EVENTS,
    },
    "ecommerce-orders": {
        "description": "Orders with nested array-of-object line items",
        "domain": "e-commerce",
        "yaml": ECOMMERCE_ORDERS,
    },
    "iot-sensor": {
        "description": "Sensor readings with enum + statistics rules",
        "domain": "iot",
        "yaml": IOT_SENSOR,
    },
}


def template_names() -> List[str]:
    return sorted(_TEMPLATES)


def get_template(name: str) -> Optional[Dict[str, str]]:
    return _TEMPLATES.get(name)
