"""Reference-parity agent surface (SURVEY §2.4 A11, the last compat
gap): ``create_domain_agent`` / ``DomainAgent`` with the reference's
system-prompt construction, composed from engine operators:

- crawl + extract: ``api.extract_website_content`` (the engine)
- knowledge extraction: ``operators.knowledge.extract_domain_knowledge``
  (deterministic stand-in; a production deployment swaps in an
  ``operators.llm``-shaped endpoint)
- chat: an injected ``operators.llm.Endpoint`` (batch prompts →
  (ok, completion)); the sandbox has no network, so tests use
  ``DeterministicEndpoint``.

The prompt templates and formatters reproduce the reference's
(`/root/reference/src/agents.py:352-425`) — that text IS the spec a
switching user expects. Like the reference's own API, this surface
returns driver-side Python objects (dataclass + strings); the
engine-side tables never collect.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame, Row, SparkSession

from website_to_agent_spark.operators.llm import Endpoint


def _format_concepts(concepts: List[Row]) -> str:
    """`_format_concepts` (`agents.py:381-397`): numbered bold names
    with 1-3 star importance indicators, description, related topics."""
    if not concepts:
        return "No specific concepts were identified from the source material."
    out = ""
    for i, c in enumerate(concepts, 1):
        stars = "⭐" * min(3, max(1, int(c["importance_score"] * 3)))
        out += f"{i}. **{c['name']}** {stars}\n"
        out += f"   {c['description']}\n"
        if c["related_concepts"]:
            out += f"   Related topics: {', '.join(c['related_concepts'])}\n"
        out += "\n"
    return out.strip()


def _format_terminology(terminology: List[Row]) -> str:
    """`_format_terminology` (`agents.py:399-410`)."""
    if not terminology:
        return "No specialized terminology was identified from the source material."
    out = ""
    for i, t in enumerate(terminology, 1):
        out += f"{i}. **{t['term']}**\n"
        out += f"   Definition: {t['definition']}\n"
        if t["context"]:
            out += f"   Context: {t['context']}\n"
        if t["examples"]:
            out += f"   Examples: {'; '.join(t['examples'])}\n"
        out += "\n"
    return out.strip()


def _format_insights(insights: List[Row]) -> str:
    """`_format_insights` (`agents.py:412-425`): confidence-tiered
    indicator per insight + related topics."""
    if not insights:
        return "No key insights were identified from the source material."
    out = ""
    for i, ins in enumerate(insights, 1):
        ind = ("🔥" if ins["confidence"] > 0.8
               else "💡" if ins["confidence"] > 0.6 else "💭")
        out += f"{i}. {ind} {ins['content']}\n"
        if ins["topics"]:
            out += f"   Related to: {', '.join(ins['topics'])}\n"
        out += "\n"
    return out.strip()


def domain_agent_system_prompt(knowledge: Row) -> str:
    """`DomainAgent._create_system_prompt` (`agents.py:358-367` +
    template to `:379`): the full instruction template around the
    formatted knowledge base."""
    concepts = knowledge["core_concepts"] or []
    domain_name = concepts[0]["name"] if concepts else "this website"
    source_url = knowledge["source_url"]
    return f"""You are a knowledgeable AI assistant specializing in {domain_name}. You have been trained on comprehensive content from {source_url} and possess deep understanding of this domain.

## YOUR KNOWLEDGE BASE

### Core Concepts and Areas of Expertise:
{_format_concepts(concepts)}

### Specialized Terminology:
{_format_terminology(knowledge["terminology"] or [])}

### Key Insights and Principles:
{_format_insights(knowledge["key_insights"] or [])}

## YOUR RESPONSE GUIDELINES

1. **Be Authoritative**: You are the expert on this domain. Provide confident, detailed answers based on your knowledge.

2. **Use Your Knowledge**: Always start with information from your specialized knowledge base. Reference specific concepts, terminology, and insights that are relevant.

3. **Be Practical**: When possible, provide actionable advice, practical examples, or specific steps the user can take.

4. **Structure Your Responses**: Use clear formatting with headings, bullet points, and numbered lists to make complex information digestible.

5. **Show Your Expertise**: Reference relevant terminology and concepts naturally in your responses to demonstrate domain knowledge.

6. **Be Honest About Limitations**: If asked about something not covered in your knowledge base, acknowledge this clearly and suggest related topics you can help with.

7. **Connect Ideas**: When relevant, explain how different concepts, insights, or terminology relate to each other and to the user's question.

8. **Provide Context**: When referencing your source material, mention that this information comes from your analysis of {source_url}.

## RESPONSE STYLE
- Be conversational but professional
- Use specific examples when possible
- Break down complex topics into understandable parts
- Always aim to provide value and actionable information
- Make connections between different aspects of the domain

Remember: You are not just answering questions - you are sharing specialized expertise to help users understand and work with {domain_name} effectively."""


@dataclass
class DomainAgent:
    """`DomainAgent` (`agents.py:299-350`): holds the knowledge +
    system prompt; ``chat`` sends [system, user] to the endpoint.
    The chat history is the caller's (the reference keeps it in
    Streamlit session state, `ui.py:586,630`)."""

    knowledge: Row
    endpoint: Endpoint
    system_prompt: str = field(init=False)

    def __post_init__(self):
        self.system_prompt = domain_agent_system_prompt(self.knowledge)

    def chat(self, message: str) -> str:
        """One exchange (`agents.py:329-350`): endpoint failure returns
        the reference's apology string instead of raising."""
        prompt = f"{self.system_prompt}\n\nUser: {message}"
        try:
            ok, completion = self.endpoint([prompt])[0]
        except Exception as e:  # endpoint transport error
            return ("I apologize, but I encountered an error while "
                    f"processing your question: {e}")
        if not ok:
            return ("I apologize, but I encountered an error while "
                    "processing your question: endpoint rejected the request")
        return completion.strip()


def extract_domain_knowledge_for_url(
    spark: SparkSession,
    pages: Optional[DataFrame],
    url: str,
    max_urls: int = 5,
    max_tokens: int = 4000,
) -> Row:
    """Crawl → combined llmstxt → DomainKnowledge row for one site —
    the engine-side half of `agents.extract_domain_knowledge`
    (`agents.py:70-297`; the LLM parse is the deterministic stand-in
    documented in ``operators.knowledge``)."""
    from website_to_agent_spark import api
    from website_to_agent_spark.operators import knowledge

    extraction = api.extract_website_content(
        spark, pages, url, max_urls=max_urls
    )
    docs = spark.createDataFrame(
        [(url, extraction["llmstxt"])], "url string, text string"
    )
    return knowledge.extract_domain_knowledge(
        docs, max_tokens=max_tokens
    ).first()


def create_domain_agent(
    spark: SparkSession,
    pages: Optional[DataFrame],
    url: str,
    endpoint: Endpoint,
    max_urls: int = 5,
) -> DomainAgent:
    """`create_domain_agent` (`agents.py:369-379`) end-to-end over the
    engine: crawl the site, extract DomainKnowledge, wrap it in a
    DomainAgent chatting through the injected endpoint."""
    row = extract_domain_knowledge_for_url(spark, pages, url, max_urls)
    return DomainAgent(knowledge=row, endpoint=endpoint)
