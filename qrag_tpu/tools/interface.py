"""Typed tool contracts.

The rebuild's counterpart of the reference's tool interfaces
(``mcp/server/interfaces/tool.py:11-111``): pydantic-validated inputs
(``extra="forbid"``), a content union that auto-serializes models, and
a ``Tool`` ABC carrying name/description/input/output models with an
async ``execute`` and a JSON-schema description.
"""

from __future__ import annotations

import abc
import json
from typing import Any, ClassVar, Dict, List, Literal, Optional, Type, Union

from pydantic import BaseModel, ConfigDict, model_validator


class BaseToolInput(BaseModel):
    """Base for all tool inputs: unknown fields are rejected."""

    model_config = ConfigDict(extra="forbid")


class ToolContent(BaseModel):
    """One piece of tool output: text, json, or a pydantic model
    (models are serialized to json content on construction)."""

    type: Literal["text", "json"] = "json"
    text: Optional[str] = None
    data: Optional[Any] = None

    @model_validator(mode="after")
    def _normalize(self) -> "ToolContent":
        if isinstance(self.data, BaseModel):
            object.__setattr__(self, "data", self.data.model_dump())
            object.__setattr__(self, "type", "json")
        if self.type == "text" and self.text is None and self.data is not None:
            object.__setattr__(self, "text", json.dumps(self.data))
        return self


class ToolResponse(BaseModel):
    """Envelope for tool results."""

    success: bool = True
    error: Optional[str] = None
    content: List[ToolContent] = []

    @classmethod
    def from_model(cls, model: BaseModel) -> "ToolResponse":
        return cls(content=[ToolContent(type="json", data=model)])

    @classmethod
    def from_text(cls, text: str) -> "ToolResponse":
        return cls(content=[ToolContent(type="text", text=text)])

    @classmethod
    def from_error(cls, error: str, **extra: Any) -> "ToolResponse":
        content = [ToolContent(type="json", data=extra)] if extra else []
        return cls(success=False, error=error, content=content)

    def first_json(self) -> Optional[Dict[str, Any]]:
        for c in self.content:
            if c.type == "json" and c.data is not None:
                return c.data
        return None


class Tool(abc.ABC):
    """Tool contract: ClassVar metadata + async execute.

    Subclasses set `name`, `description`, `input_model`, `output_model`
    and implement `execute` (async, like the reference's
    ``tool.py:96``).
    """

    name: ClassVar[str]
    description: ClassVar[str]
    input_model: ClassVar[Type[BaseToolInput]]
    output_model: ClassVar[Optional[Type[BaseModel]]] = None

    @abc.abstractmethod
    async def execute(self, input_data: BaseToolInput) -> ToolResponse: ...

    def get_schema(self) -> Dict[str, Any]:
        return {
            "name": self.name,
            "description": self.description,
            "input": self.input_model.model_json_schema(),
            "output": (
                self.output_model.model_json_schema()
                if self.output_model
                else None
            ),
        }
